from nano_pearl_tpu.utils.logging import logger

__all__ = ["logger"]
