from qa_tiger_tpu.utils.cache import enable_compilation_cache
from qa_tiger_tpu.utils.config import Box, arg_parse, build_config, load_config_module
from qa_tiger_tpu.utils.seed import seed_everything
from qa_tiger_tpu.utils.logging import (
    get_logger,
    set_logger,
    save_code_snapshot,
    logging_config,
    calculate_parameters,
)

__all__ = [
    "enable_compilation_cache",
    "Box",
    "arg_parse",
    "build_config",
    "load_config_module",
    "seed_everything",
    "get_logger",
    "set_logger",
    "save_code_snapshot",
    "logging_config",
    "calculate_parameters",
]
