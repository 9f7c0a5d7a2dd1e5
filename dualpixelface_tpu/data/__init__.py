"""Host-side data pipeline (pure numpy + threaded prefetch).

Layer map (ref dataloader/): loader_selector registry -> per-dataset Loader
(FaceDP on-disk RCV benchmark reader, SyntheticDP in-memory twin) ->
preprocess transforms -> batched, device-sharded arrays.
"""
from dualpixelface_tpu.data.loader_selector import loader_selector, register_loader
