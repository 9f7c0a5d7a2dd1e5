from dualpixelface_tpu.utils.file_manager import (
    error_handler,
    makedir_custom,
    setup_logger,
    tensor2numpy,
)
from dualpixelface_tpu.utils.table import Table
