from .logging import get_logger, log_debug, log_info, log_warn, log_error
from .timing import Timer
