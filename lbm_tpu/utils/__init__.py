from lbm_tpu.utils.checker import CheckResult, check_files

__all__ = ["CheckResult", "check_files"]
