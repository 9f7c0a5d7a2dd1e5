from dualpixelface_tpu.ops import geometry
