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
