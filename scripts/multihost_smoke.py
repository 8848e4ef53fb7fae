#!/usr/bin/env python3
"""Multi-host smoke test: the row-band-sharded stage A over TWO JAX
processes (jax.distributed over the CPU backend — the technique SURVEY.md
§4 names for multi-host testing without a pod).

Each process owns 4 virtual devices; the global mesh is (frame=2, row=4)
over 8 devices spanning both processes, so the ppermute halo exchange
crosses the process boundary. Process 0 compares the gathered sharded
result against a single-device computation — exact equality required.

    python scripts/multihost_smoke.py            # orchestrates 2 workers
    python scripts/multihost_smoke.py --worker I # internal
"""
import os
import subprocess
import sys

PORT = int(os.environ.get("SMOKE_PORT", "53423"))
N_PROC = 2
LOCAL_DEVS = 4


def worker(pid):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVS}")
    os.environ["WRENC_JAX_PLATFORM"] = "cpu"
    import jax
    jax.distributed.initialize(f"localhost:{PORT}", num_processes=N_PROC,
                               process_id=pid)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from wrenc_tpu.core.config import EncoderConfig, RateModelConfig
    from wrenc_tpu.kernels import quantize as kq
    from wrenc_tpu.search.wavefront import (_fused_luma_builder,
                                            _fused_luma_sharded_builder)
    from wrenc_tpu.spec import quant

    devs = np.array(jax.devices()).reshape(2, 4)   # global: 2 hosts x 4
    mesh = Mesh(devs, ("frame", "row"))
    assert len(jax.devices()) == N_PROC * LOCAL_DEVS

    W, H, F, QP = 64, 128, 2, 32
    sizes = (4, 8, 16, 32)
    rng = np.random.default_rng(0)                  # same data everywhere
    planes = rng.integers(0, 256, (F, H, W)).astype(np.int32)

    rm = RateModelConfig()
    ls = {s: np.int32(quant.derive_quant_params(
        QP, s.bit_length() - 1, s.bit_length() - 1, dep_quant=True,
        transform_skip=False).ls) for s in sizes}
    bd = {s: np.int32(quant.derive_quant_params(
        QP, s.bit_length() - 1, s.bit_length() - 1, dep_quant=True,
        transform_skip=False).bd_shift) for s in sizes}
    lam_dq = kq.lam_dq_table(rm, QP, trellis=False)
    lv = kq.lv_table_device(rm, True, False)
    lam = np.float32(2.0 ** (QP / rm.qp_div_dq_trellis)
                     * rm.lambda_mul_dq_trellis)

    from wrenc_tpu.kernels import intra_pred
    mats = {s: intra_pred.mats_device_f32(s, 0) for s in sizes}
    run = _fused_luma_sharded_builder(W, H, 5, sizes, F, 4, mesh)
    sharding = NamedSharding(mesh, P("frame", "row", None))
    garr = jax.make_array_from_callback(planes.shape, sharding,
                                        lambda idx: planes[idx])
    res = run(garr, ls, bd, jax.device_put(lam_dq), jax.device_put(lv), lam,
              mats)

    # gather and verify on every process (allgather is collective)
    ok = True
    single = None
    if True:
        for s in sizes:
            cands = multihost_utils.process_allgather(res[s][0],
                                                      tiled=True)
            cost = multihost_utils.process_allgather(res[s][1], tiled=True)
            if single is None:
                ref_run = _fused_luma_builder(W, H, 5, sizes, F, 4)
                single = ref_run(jax.device_put(planes), ls, bd,
                                 jax.device_put(lam_dq),
                                 jax.device_put(lv), lam, mats)
            rc = np.asarray(single[s][0])
            rb = np.asarray(single[s][1])
            if not (np.asarray(cands) == rc).all():
                ok = False
                print(f"[p{pid}] size {s}: candidate mismatch")
            if not (np.asarray(cost) == rb).all():
                ok = False
                print(f"[p{pid}] size {s}: cost mismatch")
    print(f"[p{pid}] multihost row-band stage A: "
          f"{'OK (exact match)' if ok else 'MISMATCH'}")
    sys.exit(0 if ok else 1)


def main():
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(here) + os.pathsep + \
        env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, __file__, "--worker",
                               str(i)], env=env)
             for i in range(N_PROC)]
    rc = [p.wait(timeout=900) for p in procs]
    if any(rc):
        print("multihost smoke FAILED", rc)
        sys.exit(1)
    print("multihost smoke PASSED: 2 processes x 4 devices, "
          "halo exchange across the process boundary, exact results")


if __name__ == "__main__":
    main()
