"""Four-step NTT sharded over every available device.

On a machine with one chip, emulate a mesh with virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/distributed_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
from jax.sharding import Mesh

from ntt_aie_tpu import NTTConfig, P_469762049 as field
from ntt_aie_tpu.parallel.fourstep import build_distributed_plan


def main() -> int:
    devs = jax.devices()
    D = 1 << (len(devs).bit_length() - 1)  # largest power of two
    cfg = NTTConfig(field=field, log_n=16, rows_log2=8, num_shards=D)
    mesh = Mesh(np.array(devs[:D]), (cfg.mesh_axis,))
    plan = build_distributed_plan(cfg, mesh)

    rng = np.random.default_rng(0)
    a = rng.integers(0, field.p, cfg.n)
    spec = plan.fwd(plan.shard_input(a))          # one all_to_all inside
    back = np.asarray(plan.inv(spec)).reshape(-1)
    assert np.array_equal(back, a)
    print(f"n=2^{cfg.log_n} four-step NTT over {D} device(s): roundtrip ✓")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
