from dualpixelface_tpu.config.manager import Config, Configuration, load_config
