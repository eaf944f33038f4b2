import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from plslam_tpu.ops import fast
from plslam_tpu.ops.pallas_fast import fast_score_nms

print("backend:", jax.default_backend())

def xla_ref(img, th):
    return fast.nms3x3(fast.fast_score_map(img, th))
xla_ref_j = jax.jit(xla_ref, static_argnums=1)

rng = np.random.default_rng(0)
for shape in [(480, 640), (400, 533), (200, 266)]:
    img = jnp.asarray(rng.integers(0, 256, size=shape).astype(np.float32))
    # correctness on real TPU
    got = np.asarray(fast_score_nms(img, 7.0))
    want = np.asarray(xla_ref_j(img, 7.0))
    ok = np.allclose(got, want, atol=0)
    print(shape, "exact-match:", ok, "mismatches:", int((got != want).sum()))
    # timing: amortized over 30 dispatches, one trailing sync
    for name, fn in [("pallas", lambda: fast_score_nms(img, 7.0)),
                     ("xla", lambda: xla_ref_j(img, 7.0))]:
        fn().block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(30):
                o = fn()
            o.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / 30)
        print(f"  {name}: {best*1000:.3f} ms")
