"""DeblurDP dataset — reserved placeholder matching the reference's empty
dataloader/DeblurDP/loader.py stub (config present, loader unimplemented)."""
