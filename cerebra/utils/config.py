"""Flag/config helpers.

Replaces the reference's config surface (SURVEY.md §5): `bool_flag`
(utils/utils.py:201-212), seeding (utils/utils.py:215-221), and — crucially —
the stringly-typed `--hyperprams` dict that the reference passes through
`eval()` (LstmDistillFromDinoV2Train.py:247-255 and 5 clones). Here it is
parsed safely: JSON first, then a restricted Python-literal fallback
(ast.literal_eval) so the reference's single-quoted CLI strings keep working.
"""

from __future__ import annotations

import argparse
import ast
import json
from typing import Dict


def bool_flag(s: str) -> bool:
    falsy = {"off", "false", "0"}
    truthy = {"on", "true", "1"}
    if s.lower() in falsy:
        return False
    if s.lower() in truthy:
        return True
    raise argparse.ArgumentTypeError("invalid value for a boolean flag")


def parse_hyperparams(s: str) -> Dict:
    """Parse `--hyperprams "{'alpha': 1, ...}"` without eval()."""
    if not s:
        return {}
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        try:
            out = ast.literal_eval(s)
        except (ValueError, SyntaxError) as e:
            # called post-parse (not as an argparse type), so raise a clean
            # usage error instead of letting SyntaxError traceback mid-run
            raise SystemExit(
                f"--hyperprams is neither JSON nor a Python literal dict: {s!r} ({e})"
            )
        if not isinstance(out, dict):
            raise SystemExit(f"--hyperprams must be a dict, got {type(out).__name__}")
        return out


def fix_random_seeds(seed: int = 31) -> None:
    """Seed numpy (+torch if present) like utils/utils.py:215-221; JAX code
    threads explicit PRNG keys instead of global state."""
    import numpy as np

    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass


def get_sha() -> str:
    """Current git SHA + dirty flag (utils/utils.py:403-420)."""
    import subprocess

    cwd = __import__("os").path.dirname(__import__("os").path.abspath(__file__))
    try:
        sha = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=cwd, stderr=subprocess.DEVNULL
        ).decode().strip()
        diff = subprocess.check_output(
            ["git", "diff-index", "HEAD"], cwd=cwd, stderr=subprocess.DEVNULL
        ).decode().strip()
        return f"sha: {sha}, status: {'has uncommitted changes' if diff else 'clean'}"
    except Exception:
        return "sha: N/A"


def is_main_process() -> bool:
    """Rank-0 check (utils/utils.py:436-449 is_main_process/save_on_master)."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def setup_for_distributed(is_master: bool) -> None:
    """Gate print() to the master process (utils/utils.py:452-464)."""
    import builtins

    builtin_print = builtins.print

    def gated(*args, force=False, **kwargs):
        if is_master or force:
            builtin_print(*args, **kwargs)

    builtins.print = gated
