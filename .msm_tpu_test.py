import time, sys, jax
import numpy as np
from barretenberg_tpu.fields import fr
from barretenberg_tpu.msm import pippenger
from barretenberg_tpu.groups.g1 import random_affine_points, jacobian_to_host, points_to_host
from barretenberg_tpu.utils import host_curve

logN = int(sys.argv[1]) if len(sys.argv) > 1 else 16
c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
block = int(sys.argv[3]) if len(sys.argv) > 3 else 256
N = 1 << logN
rng = np.random.default_rng(11)
# generate N points fast: random multiples would be slow on host; use doubling chain
base = random_affine_points(64, rng)
import jax.numpy as jnp
from barretenberg_tpu.groups import g1, AffinePoints
reps = N // 64
pts = AffinePoints(jnp.tile(base.x, (1, reps)), jnp.tile(base.y, (1, reps)), jnp.tile(base.inf, reps))
scalars = [int.from_bytes(rng.bytes(32), 'little') % fr.p for _ in range(N)]
S = fr.encode(scalars)
print("backend:", jax.default_backend(), "N=2^%d c=%d block=%d" % (logN, c, block), flush=True)
t0 = time.time()
res = pippenger(S, pts, c=c, block=block)
res.x.block_until_ready()
print("compile+first run s:", round(time.time()-t0, 1), flush=True)
t0 = time.time()
res = pippenger(S, pts, c=c, block=block); res.x.block_until_ready()
dt = time.time()-t0
print("run s: %.3f  us/point: %.2f" % (dt, dt/N*1e6), flush=True)
# correctness vs host oracle (merge scalars per distinct point: sum scalars mod r for each base point)
merged = [0]*64
for i, s in enumerate(scalars): merged[i % 64] = (merged[i % 64] + s) % fr.p
host = host_curve.g1_msm(points_to_host(base), merged)
print("matches host oracle:", jacobian_to_host(res)[0] == host, flush=True)
