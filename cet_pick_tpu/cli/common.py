"""Argparse <-> Config bridge.

Replaces the reference's monolithic ``opts`` class (reference:
cet_pick/opts.py:17-189) by generating flags straight from the Config
dataclass fields — same flag names, single source of truth, and the parsed
Config is serialized into checkpoints so train/inference flags can't drift.
"""

from __future__ import annotations

import argparse
import dataclasses

from cet_pick_tpu.config import Config

_SKIP = {"heads", "exp_dir", "save_dir", "debug_dir", "out_path"}  # derived


def add_config_arguments(parser: argparse.ArgumentParser,
                         defaults: Config = None) -> argparse.ArgumentParser:
    defaults = defaults or Config()
    for f in dataclasses.fields(Config):
        if f.name in _SKIP:
            continue
        default = getattr(defaults, f.name)
        flag = "--" + f.name
        if f.type == "bool" or isinstance(default, bool):
            # BooleanOptionalAction gives --flag / --no-flag so a True
            # default (e.g. train's contrastive) can still be disabled
            parser.add_argument(flag, action=argparse.BooleanOptionalAction,
                                default=default)
        elif isinstance(default, tuple):
            elem = float if any(isinstance(v, float) for v in default) else int
            parser.add_argument(flag, nargs="*", type=elem, default=default)
        elif isinstance(default, float):
            parser.add_argument(flag, type=float, default=default)
        elif isinstance(default, int):
            parser.add_argument(flag, type=int, default=default)
        else:
            parser.add_argument(flag, type=str, default=default)
    return parser


def config_from_args(args: argparse.Namespace) -> Config:
    known = {f.name for f in dataclasses.fields(Config)}
    kwargs = {k: v for k, v in vars(args).items() if k in known}
    for k in ("lr_step", "mesh_shape", "tile", "dog"):
        if k in kwargs and isinstance(kwargs[k], list):
            kwargs[k] = tuple(kwargs[k])
    return Config(**kwargs).finalize()


def parse_config(argv=None, task=None, **overrides) -> Config:
    parser = argparse.ArgumentParser()
    if task is not None:
        overrides.setdefault("task", task)
    add_config_arguments(parser, Config(**overrides))
    return config_from_args(parser.parse_args(argv))
