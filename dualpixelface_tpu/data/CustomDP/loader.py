"""CustomDP dataset — reserved placeholder matching the reference's empty
dataloader/CustomDP/loader.py stub (config present, loader unimplemented)."""
