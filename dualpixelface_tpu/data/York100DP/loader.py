"""York100DP dataset — reserved placeholder matching the reference's empty
dataloader/York100DP/loader.py stub (config present, loader unimplemented)."""
