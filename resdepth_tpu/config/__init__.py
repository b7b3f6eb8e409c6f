from resdepth_tpu.config import schema
from resdepth_tpu.config.defaults import default_cfg
from resdepth_tpu.config.io import merge, print_json, read_json, remove_obsolete_keys, write_json
