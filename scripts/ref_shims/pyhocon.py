"""pyhocon shim backed by the first-party HOCON parser.

Reference usage surface (`exp_runner.py:12,94`): `ConfigFactory.
parse_string`, then ConfigTree `get/get_bool/get_int/get_float/
get_string/get_list`, dotted `__getitem__`, `put`, and `**conf["model.x"]`
unpacking — all provided by `fmov_pose_tpu.data.hocon.ConfigTree`.
"""

from fmov_pose_tpu.data.hocon import ConfigTree, parse_string, parse_file

__all__ = ["ConfigFactory", "ConfigTree"]


class ConfigFactory:
    @staticmethod
    def parse_string(text):
        return parse_string(text)

    @staticmethod
    def parse_file(path):
        return parse_file(path)
