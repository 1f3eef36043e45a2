"""Tolerant absl flag definitions.

The CLI modules share flag names (every script takes --config_path, like the
reference's run_*.py); when several CLI modules are imported into one
process (tests, notebooks) absl raises DuplicateFlagError.  Define through
this helper to make redefinition of an identical flag a no-op.
"""

from __future__ import annotations

from absl import flags


def define_string(name: str, default, help_: str) -> None:
    try:
        flags.DEFINE_string(name, default, help_)
    except flags.DuplicateFlagError:
        pass


def define_integer(name: str, default, help_: str) -> None:
    try:
        flags.DEFINE_integer(name, default, help_)
    except flags.DuplicateFlagError:
        pass


def define_bool(name: str, default, help_: str) -> None:
    try:
        flags.DEFINE_bool(name, default, help_)
    except flags.DuplicateFlagError:
        pass
