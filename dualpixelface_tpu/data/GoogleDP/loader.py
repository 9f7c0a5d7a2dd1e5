"""GoogleDP dataset — reserved placeholder matching the reference's empty
dataloader/GoogleDP/loader.py stub (config present, loader unimplemented)."""
