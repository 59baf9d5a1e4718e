"""Regenerate the golden constants in tests/test_golden.py.

Run from the repo root: ``python tests/regen_golden.py``. Prints fresh
``GOLDEN_*`` constants to paste into test_golden.py after an INTENTIONAL
numerics change (state why in the commit message). Mirrors the conftest
environment (CPU, fp32 matmuls) so the values match what pytest will see.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# match conftest's virtual device count (XLA_FLAGS is read at backend init,
# so setting it here still works even though sitecustomize imported jax)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# env vars alone don't work on this box (sitecustomize pre-imports jax)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import test_golden as tg  # noqa: E402


def _r6(xs):
    # 9 digits: the tests assert rtol=1e-4, so 6-digit rounding would eat
    # the whole tolerance for losses below ~5e-3 (e.g. a decayed zoo loss)
    return [round(x, 9) for x in xs]


def main():
    g, _ = tg._trajectory(*tg._setup(), n=5)
    print(f"GOLDEN_LOSSES = {_r6(g)}")
    g, d = tg._trajectory(*tg._gan_setup(), n=5)
    print(f"GOLDEN_GAN_G = {_r6(g)}")
    print(f"GOLDEN_GAN_D = {_r6(d)}")
    g, _ = tg._trajectory(*tg._prior_setup(), n=5)
    print(f"GOLDEN_LEARNED_PRIOR = {_r6(g)}")
    g, _ = tg._trajectory(*tg._gru_setup(), n=5)
    print(f"GOLDEN_GRU = {_r6(g)}")
    print("GOLDEN_ZOO = {")
    for name in sorted(tg.GOLDEN_ZOO):
        g, _ = tg._trajectory(*tg._zoo_setup(name))
        print(f'    "{name}": {_r6(g)},')
    print("}")


if __name__ == "__main__":
    main()
