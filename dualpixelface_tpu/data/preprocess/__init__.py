from dualpixelface_tpu.data.preprocess.preprocess import basic_transform, raw_transform
