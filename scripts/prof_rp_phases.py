#!/usr/bin/env python
"""Phase-level timing of one range-proof chunk on TPU (cumulative syncs)."""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rofl_tpu.utils.cache import setup_cache
setup_cache()

from rofl_tpu.crypto import pedersen, range_proof as RP
from rofl_tpu.crypto import range_proof_vec as rpv
from rofl_tpu.crypto.fp_codec import FpConfig
from rofl_tpu.ops import sc, curve, msm
from rofl_tpu.spec import scalar as SSs
from rofl_tpu.spec.merlin import Transcript

fp = FpConfig(16, 7)
rng = np.random.default_rng(11)
lo, hi = fp.clip_bounds(8)
vals = rng.uniform(lo, hi, 32768).astype(np.float32)
blindL = [int(x) for x in sc.unpack_scalars(pedersen.rnd_scalar_limbs(32768, rng))]
values = rpv.shifted_fixed_values(vals, fp, 8)[:2048]
blinds = blindL[:2048]


def sync(x):
    if isinstance(x, curve.PointArray):
        x = x.x
    np.asarray(x[:1, :1])


t = Transcript(b"RangeProof")
t0 = time.time()
proof, vb, _V = RP.prove_multiple(t, values, blinds, 8, rng)
print(f"warm prove: {time.time()-t0:.2f}s", flush=True)
t = Transcript(b"RangeProof")
t0 = time.time()
proof, vb, _V = RP.prove_multiple(t, values, blinds, 8, rng)
print(f"second prove: {time.time()-t0:.2f}s", flush=True)

n, m = 8, 2048
nm = n * m
transcript = Transcript(b"RangeProof")
gens_G, gens_H = RP.device_bp_gens(n, m)
T0 = time.time()
last = [T0]


def ck(name, x=None):
    if x is not None:
        sync(x)
    now = time.time()
    print(f"  {name}: +{now-last[0]:.3f}s (cum {now-T0:.2f})", flush=True)
    last[0] = now


transcript.append_message(b"dom-sep", b"rangeproof v1")
transcript.append_u64(b"n", n)
transcript.append_u64(b"m", m)
v_limbs = jnp.asarray(sc.pack_scalars(values))
gamma_limbs = jnp.asarray(sc.pack_scalars(blinds))
ck("pack inputs")
V = pedersen.pedersen_commit(v_limbs, gamma_limbs)
ck("V commit", V)
V_bytes = RP._compress_bytes(V)
ck("V compress+to-host")
for vbb in V_bytes:
    transcript.append_message(b"V", vbb)
ck("V absorb (host merlin)")
bits_np = np.zeros(nm, dtype=np.uint32)
for j, v in enumerate(values):
    for i in range(n):
        bits_np[j * n + i] = (int(v) >> i) & 1
ck("bit decomp (host)")
bits = jnp.asarray(bits_np)
a_L = jnp.zeros((16, nm), jnp.uint32).at[0].set(bits)
a_R = sc.sub(a_L, jnp.asarray(sc.pack_scalars([1] * nm)))
ck("a_L/a_R", a_R)
a_blinding = int(sc.unpack_scalars(pedersen.rnd_scalar_limbs(1, rng))[0])
terms = curve.select(bits == 1, gens_G, curve.neg(gens_H))
A_pt = curve.add(pedersen.base_H().mul(RP._const(a_blinding)),
                 curve.tree_sum(terms))
ck("A point", A_pt)
s_blinding = int(sc.unpack_scalars(pedersen.rnd_scalar_limbs(1, rng))[0])
s_L = jnp.asarray(pedersen.rnd_scalar_limbs(nm, rng))
s_R = jnp.asarray(pedersen.rnd_scalar_limbs(nm, rng))
ck("rnd s_L/s_R (host rng+reduce)")
S_pt = curve.add(pedersen.base_H().mul(RP._const(s_blinding)),
                 curve.add(msm.msm(gens_G, s_L), msm.msm(gens_H, s_R)))
ck("S point (2 msm)", S_pt)
AB = RP._compress_bytes(A_pt)[0]
SB = RP._compress_bytes(S_pt)[0]
transcript.append_message(b"A", AB)
transcript.append_message(b"S", SB)
y = transcript.challenge_scalar(b"y")
z = transcript.challenge_scalar(b"z")
zz = (z * z) % SSs.L
ck("A/S compress + challenges")
exp_y = sc.powers(RP._const(y), nm)
zz2_np = sc.pack_scalars(
    [(zz * pow(z, k // n, SSs.L) * pow(2, k % n, SSs.L)) % SSs.L
     for k in range(nm)])
ck("zz2 host loop")
zz2 = jnp.asarray(zz2_np)
z_vec = jnp.broadcast_to(RP._const(z), (16, nm))
l0 = sc.sub(a_L, z_vec)
l1 = s_L
r0 = sc.add(sc.mul(exp_y, sc.add(a_R, z_vec)), zz2)
r1 = sc.mul(exp_y, s_R)
t0_ = sc.inner_product(l0, r0, axis=0)
t2_ = sc.inner_product(l1, r1, axis=0)
t1f = sc.inner_product(sc.add(l0, l1), sc.add(r0, r1), axis=0)
ck("t-poly inner products", t1f)
t0_i = sc.unpack_scalars(np.asarray(t0_))[0]
ck("t sync")

# IPA: time the first three rounds individually via a stripped loop
y_inv = pow(y, SSs.L - 2, SSs.L)
Q = curve.pack_points([__import__("rofl_tpu.spec.ristretto",
                                  fromlist=["r"]).BASEPOINT])
a = l0
b = r0
y_inv_pows = sc.powers(RP._const(y_inv), nm)
gp = 1
ch = 1
G_pts, H_pts = gens_G, gens_H
s = nm
rnd = 0
while s > 1 and rnd < 3:
    h = s // 2
    a_Lh, a_Rh = a[:, :h], a[:, h:s]
    b_Lh, b_Rh = b[:, :h], b[:, h:s]
    G_L, G_R = RP._point_slice(G_pts, slice(0, h)), RP._point_slice(G_pts, slice(h, s))
    H_L, H_R = RP._point_slice(H_pts, slice(0, h)), RP._point_slice(H_pts, slice(h, s))
    c_L = sc.inner_product(a_Lh, b_Rh)
    c_R = sc.inner_product(a_Rh, b_Lh)
    ck(f"r{rnd} inner", c_R)
    ypend = sc.mul(y_inv_pows[:, :h], RP._const(ch))
    L_scal = jnp.concatenate([sc.mul(a_Lh, RP._const(gp)), sc.mul(b_Rh, ypend), c_L], axis=1)
    L_pt = msm.msm(RP._point_concat(RP._point_concat(G_R, H_L), Q), L_scal)
    yR = pow(y_inv, h, SSs.L)
    R_scal = jnp.concatenate([sc.mul(a_Rh, RP._const(gp)), sc.mul(b_Lh, sc.mul(ypend, RP._const(yR))), c_R], axis=1)
    R_pt = msm.msm(RP._point_concat(RP._point_concat(G_L, H_R), Q), R_scal)
    ck(f"r{rnd} msm x2", R_pt)
    both = RP._compress_bytes(RP._point_concat(L_pt, R_pt))
    ck(f"r{rnd} compress+host")
    u = 12345678901234567890 % SSs.L
    u_inv = pow(u, SSs.L - 2, SSs.L)
    a = sc.add(sc.mul(a_Lh, RP._const(u)), sc.mul(a_Rh, RP._const(u_inv)))
    b = sc.add(sc.mul(b_Lh, RP._const(u_inv)), sc.mul(b_Rh, RP._const(u)))
    usq = (u * u) % SSs.L
    G_pts = curve.add(G_L, curve.scalar_mul(G_R, RP._const(usq)))
    H_pts = curve.add(H_L, curve.scalar_mul(H_R, RP._const((pow(u_inv, 2, SSs.L) * yR) % SSs.L)))
    ck(f"r{rnd} folds", H_pts)
    gp = (gp * u_inv) % SSs.L
    ch = (ch * u) % SSs.L
    s = h
    rnd += 1
