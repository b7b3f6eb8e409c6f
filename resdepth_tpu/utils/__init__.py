from resdepth_tpu.utils.attrdict import AttrDict
from resdepth_tpu.utils import fs
from resdepth_tpu.utils.logging import setup_logger, add_console_logger, add_file_logger
