"""Run the few-shot multi-T validations on the available backend.

The pytest versions (tests/test_loop_inversion.py::test_run_seq_multiT_rollout
/ ::test_fewshot_driver_multiT_curriculum) are pinned to the CPU mesh by
conftest; their programs (several full generator forwards in one graph) are
XLA-CPU-compile-bound and exceed 3 h on a single-core host. This script runs
the SAME assertions outside pytest so the backend defaults to the TPU, whose
compiler service finishes the programs in minutes. Run:

    python scripts/validate_fewshot_multiT.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)

# tests/conftest is not imported here — keep whatever backend jax picks
from tests import test_loop_inversion as t  # noqa: E402


def main():
    import jax

    print("backend:", jax.devices()[0].platform, flush=True)
    print("== rollout (prefix-chunk GRU semantics) ==", flush=True)
    t.test_run_seq_multiT_rollout()
    print("PASS test_run_seq_multiT_rollout", flush=True)

    print("== driver (phase machine, param groups, resume) ==", flush=True)
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        t.test_fewshot_driver_multiT_curriculum(Path(d))
    print("PASS test_fewshot_driver_multiT_curriculum", flush=True)


if __name__ == "__main__":
    main()
