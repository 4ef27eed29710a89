import jax, numpy as np
print("backend:", jax.default_backend(), jax.devices(), flush=True)
from barretenberg_tpu.fields import fq, fr
rng = np.random.default_rng(99)
vals_a = [int.from_bytes(rng.bytes(32), "little") % fq.p for _ in range(128)]
vals_b = [int.from_bytes(rng.bytes(32), "little") % fq.p for _ in range(128)]
out = fq.decode(jax.jit(fq.mont_mul)(fq.encode(vals_a), fq.encode(vals_b)))
print("TPU modmul 128 lanes correct:", all((a*b) % fq.p == c for a, b, c in zip(vals_a, vals_b, out)), flush=True)
edge = fq.decode(fq.mont_mul(fq.encode([fq.p-1, 0, 1]), fq.encode([fq.p-1, 12345, 1])))
print("edges [(p-1)^2, 0*x, 1*1]:", edge == [1, 0, 1], flush=True)
try:
    fr.sqrt(fr.encode([4])); print("fr.sqrt: NO ERROR (bad)")
except NotImplementedError as e:
    print("fr.sqrt raises:", str(e)[:70])
from barretenberg_tpu.fields.limbs import ints_to_limbs
try:
    ints_to_limbs([1 << 280]); print("no error (bad)")
except ValueError as e:
    print("oversized int ->", e)
print("done", flush=True)

# --- G1 group law on TPU ---
from barretenberg_tpu.groups import g1
from barretenberg_tpu.groups.g1 import random_affine_points, jacobian_to_host, points_to_host, scalar_mul
from barretenberg_tpu.utils import host_curve
rng2 = np.random.default_rng(5)
a = random_affine_points(4, rng2); b = random_affine_points(4, rng2)
dev = jacobian_to_host(jax.jit(g1.add)(g1.to_jacobian(a), g1.to_jacobian(b)))
host = [host_curve.g1_add(x, y) for x, y in zip(points_to_host(a), points_to_host(b))]
print("TPU g1.add matches host oracle:", dev == host, flush=True)
k = 0xDEADBEEFCAFEF00D
print("TPU scalar_mul matches host:", jacobian_to_host(scalar_mul(g1.generator((1,)), k))[0] == host_curve.g1_mul(host_curve.G1_GENERATOR, k), flush=True)
# probe: P + (-P) -> infinity lane, and infinity propagates through normalize
j = g1.to_jacobian(a)
res = jax.jit(lambda pj: g1.add(pj, g1.neg(pj)))(j)
print("P+(-P) all infinity:", bool(res.inf.all()), "normalized:", jacobian_to_host(res), flush=True)
print("done2", flush=True)
