import time, numpy as np, jax, jax.numpy as jnp
import pt
from pt.scene.examples import make_heightfield_scene
from pt.scene.flatten import flatten_scene, world_vertices
from pt.accel.pallas_bvh import (build_packet_bvh_sah, build_bf8,
                                 packet_closest_v4, packet_closest_bf8)
from pt.accel.intersect import intersect_brute
from pt.render.integrator import _coherence_keys

scene = make_heightfield_scene(224); ds = flatten_scene(scene)
wpos = jax.jit(lambda d: world_vertices(d)[0])(ds)
sah = build_packet_bvh_sah(np.asarray(wpos), np.asarray(ds.tri_idx))
bf8 = build_bf8(sah)
print("bf8 n8", bf8.n8, "n_leaves", bf8.n_leaves,
      "smem_kb", (7*bf8.n8*8 + 6*bf8.n_leaves)*4//1024, flush=True)
n = 65536
rng = np.random.default_rng(0)
o_np = rng.uniform(-9, 9, (n,3)).astype(np.float32); o_np[:,1] = rng.uniform(-3,0,(n,))
d_np = rng.normal(size=(n,3)); d_np /= np.linalg.norm(d_np,axis=-1,keepdims=True)
o = jnp.asarray(o_np); d = jnp.asarray(d_np.astype(np.float32))
keys = _coherence_keys(sah, o, d, jnp.ones((n,), bool))
perm = jnp.argsort(keys); o_s, d_s = o[perm], d[perm]

hit = packet_closest_bf8(bf8, o_s, d_s, 1e4); jax.block_until_ready(hit.t)
m = 4096
hb = jax.jit(intersect_brute)(wpos, ds.tri_idx, o_s[:m], d_s[:m])
bad = int((np.abs(np.asarray(hb.t)-np.asarray(hit.t)[:m])>1e-3).sum())
tid = (np.asarray(hb.tri) == np.asarray(hit.tri)[:m]).mean()
print(f"bf8 mismatches: {bad}/{m}  tri agree: {tid:.4f}", flush=True)

REPS = 10
def timed(fn, bvh, o, d, label):
    @jax.jit
    def loop(bvh, o, d):
        def body(i, acc):
            hit = fn(bvh, o, d, acc)
            return hit.t*0 + 1e4
        return jax.lax.fori_loop(0, REPS, body, jnp.full((n,),1e4))
    jax.block_until_ready(loop(bvh, o, d))
    t0=time.perf_counter(); jax.block_until_ready(loop(bvh, o, d))
    print(f"{label}: {(time.perf_counter()-t0)/REPS*1e3:.2f} ms", flush=True)

timed(packet_closest_v4, sah, o_s, d_s, "v4  sorted  ")
timed(packet_closest_bf8, bf8, o_s, d_s, "bf8 sorted  ")
timed(packet_closest_v4, sah, o, d,     "v4  unsorted")
timed(packet_closest_bf8, bf8, o, d,    "bf8 unsorted")
