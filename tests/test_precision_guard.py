"""Tripwire: physics matmuls must pin HIGHEST precision.

TPU f32 matmuls default to bf16 passes; a position-carrying matmul without
an explicit precision pin caused a 100 K -> 6000 K thermal runaway (see
docs/performance.md). This guard greps the kernels for unpinned dots.
CPU tests cannot catch the regression (CPU f32 matmuls are true f32).
"""

import re
from pathlib import Path

import cavmd_tpu

PKG = Path(cavmd_tpu.__file__).parent
FILES = [
    PKG / "ops" / "bonds.py",
    PKG / "ops" / "pppm.py",
    PKG / "ops" / "neighbor.py",
]


def test_physics_matmuls_pin_precision():
    pattern = re.compile(r"jnp\.(dot|einsum)\(", re.M)
    for path in FILES:
        src = path.read_text()
        for m in pattern.finditer(src):
            # examine the full call (to the matching close paren, roughly:
            # next 400 chars is enough for these call sites)
            window = src[m.start():m.start() + 400]
            call = window[: window.find(")\n") + 1] or window
            assert "precision" in call, (
                f"{path.name}: unpinned {m.group(0)} at offset {m.start()} — "
                "TPU f32 matmuls default to bf16; pin precision=HIGHEST"
            )
