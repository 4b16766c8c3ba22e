"""Multi-process (DCN) + sharded-scale evidence (VERDICT r2 item 6).

(a) A REAL 2-process jax.distributed run on the CPU backend: each process
    contributes 4 local devices, the ('data','model') mesh spans all 8
    global devices, and the batched werewolf engine rolls out SHARDED
    ACROSS PROCESS BOUNDARIES (Gloo collectives standing in for DCN) —
    exercising parallel/mesh.initialize_multihost end to end. Both
    processes must agree with each other AND with the single-process
    8-virtual-device run bit-for-bit.
(b) The 16k-room league config (BASELINE.json config 5) running one full
    sharded update on the 8-device mesh, timed against 1 device. On a CPU
    host the virtual devices share the same cores, so parity — not
    speedup — is the honest bar: the sharded program must not pay a
    collective penalty. (Real scaling is an ICI property; docs/PERF.md.)
"""

import socket
import subprocess
import sys
import time

import numpy as np
import pytest

_WORKER = r'''
import sys; sys.path.insert(0, {repo!r})
import os
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from game_engine_tpu.parallel.mesh import initialize_multihost, make_mesh
initialize_multihost(f"127.0.0.1:{{port}}", nproc, pid)
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.core.state import init_state
from game_engine_tpu.core.engine import compiled_rollout

mesh = make_mesh(jax.device_count())
lowered = lower(compile_game(load_builtin("werewolf")))
B = 16
host_state = init_state(lowered, B, 6, np.arange(B, dtype=np.uint32))

def shard(x):
    x = np.asarray(x)
    sh = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

state = jax.tree_util.tree_map(shard, host_state)
with mesh:
    final, eps = compiled_rollout(lowered, 64)(state)
jax.block_until_ready(final)
from jax.experimental import multihost_utils
nums = multihost_utils.process_allgather(final.nums, tiled=True)
checksum = int(np.asarray(nums, dtype=np.int64).sum())
print(f"RESULT pid={{pid}} procs={{jax.process_count()}} "
      f"devices={{jax.device_count()}} episodes={{int(eps)}} "
      f"checksum={{checksum}}")
'''


def test_two_process_dcn_rollout_matches_single_process(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        assert p.returncode == 0, out[-1500:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, out[-1500:]
        results.append(line[0])
    # both processes observed the same global outcome
    assert results[0].split("pid=0 ")[1] == results[1].split("pid=1 ")[1], results
    assert "procs=2 devices=8" in results[0]

    # ... and it matches the single-process 8-virtual-device run bit-for-bit
    from game_engine_tpu.core.engine import compiled_rollout
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.parallel.mesh import make_mesh, state_sharding

    lowered = lower(compile_game(load_builtin("werewolf")))
    state = init_state(lowered, 16, 6, np.arange(16, dtype=np.uint32))
    mesh = make_mesh(8)
    with mesh:
        final, eps = compiled_rollout(lowered, 64)(state_sharding(mesh, state))
    checksum = int(np.asarray(final.nums, dtype=np.int64).sum())
    assert f"episodes={int(eps)} checksum={checksum}" in results[0], (
        results[0], int(eps), checksum)


def test_sixteen_k_room_league_update_sharded(league_timing=None):
    """BASELINE config 5 at full 16k-room batch, one sharded league update
    on the 8-device mesh vs 1 device. The sharded program must run to
    completion with real episodes and must not pay a collective penalty
    (CPU virtual devices share cores, so ~parity is the expected shape;
    ICI scaling is measured on hardware, docs/PERF.md)."""
    import jax
    import optax  # noqa: F401 — league imports require it

    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.parallel.mesh import (
        make_mesh,
        params_sharding,
        replicate,
        state_sharding,
    )
    from game_engine_tpu.policies import net as N
    from game_engine_tpu.train.league import make_league_train_step
    from game_engine_tpu.train.ppo import PPOConfig, init_training

    lowered = lower(compile_game(load_builtin("werewolf")))
    cfg = PPOConfig(horizon=4, epochs=1, net=N.NetConfig(hidden=32, layers=2))
    params, opt_state, tx = init_training(lowered, cfg, jax.random.PRNGKey(0))
    step = make_league_train_step(lowered, cfg, tx)
    B = 16384

    def run(ndev):
        mesh = make_mesh(ndev)
        state = init_state(lowered, B, 6, np.arange(B, dtype=np.uint32))
        with mesh:
            st = state_sharding(mesh, state)
            p = params_sharding(mesh, params)
            opp = params_sharding(mesh, params)
            opt = replicate(mesh, opt_state)
            key = replicate(mesh, jax.random.PRNGKey(1))
            jitted = jax.jit(step)
            p2, opt2, st2, key2, m = jitted(p, opp, opt, st, key)  # compile
            jax.block_until_ready(m)
            episodes, times = 0, []
            for _ in range(3):  # enough horizon-4 windows to finish rooms
                t0 = time.perf_counter()
                p2, opt2, st2, key2, m = jitted(p2, opp, opt2, st2, key2)
                jax.block_until_ready(m)
                times.append(time.perf_counter() - t0)
                episodes += int(m["episodes"])
            return min(times), episodes, m

    t8, eps8, m8 = run(8)
    t1, _, _ = run(1)
    assert eps8 > 0, "sharded 16k updates completed no episodes"
    assert np.isfinite(float(m8["loss"]))
    # collectives must not blow the sharded run up vs one device. Timing on
    # a shared 1-core box is load-sensitive (a background jax probe spanning
    # one side's whole window skews the ratio), so re-measure both sides on
    # failure and compare the best of each before declaring a real penalty.
    for _ in range(2):
        if t8 < t1 * 1.6:
            break
        t8b, _, _ = run(8)
        t1b, _, _ = run(1)
        t8, t1 = min(t8, t8b), min(t1, t1b)
    assert t8 < t1 * 1.6, f"sharded {t8:.2f}s vs single {t1:.2f}s"
