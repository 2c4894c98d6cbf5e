"""Utilities (reference: ``src/utils/`` + ``src/models/utils/``)."""
from .parser import (
    prepare_parser_from_dict,
    parse_args_as_dict,
    str2bool,
    str2bool_arg,
    str_int_float,
)
from .features import pad_x_to_y, split_feature, merge_feature, get_bandwidths
from .separator import separate
from .flops import flops_report, count_params

__all__ = [
    "prepare_parser_from_dict",
    "parse_args_as_dict",
    "str2bool",
    "str2bool_arg",
    "str_int_float",
    "pad_x_to_y",
    "split_feature",
    "merge_feature",
    "get_bandwidths",
    "separate",
    "flops_report",
    "count_params",
]
