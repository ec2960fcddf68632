"""Microbench: fused conv kernel vs XLA at SuperPoint encoder shapes.

Timing uses on-device scalar reduction (tunnel transfers must be tiny)
+ the marginal-cost protocol (bench.py convention).
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_C = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
import jax
try:
    jax.config.update("jax_compilation_cache_dir", _C)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception: pass
import jax.numpy as jnp, numpy as np
from deepfepe_tpu.ops.pallas.conv_pallas import conv3x3_affine_relu

def timeit(f, *a, iters=10):
    float(np.asarray(f(*a)))
    def run(k):
        t0=time.perf_counter()
        r=None
        for _ in range(k): r = f(*a)
        float(np.asarray(r))
        return time.perf_counter()-t0
    t1,t2 = run(iters), run(2*iters)
    return max(t2-t1,1e-9)/iters

for (B,H,W,Cin,C,tag) in [(8,376,1240,1,64,"inc.conv0"),(8,376,1240,64,64,"inc.conv1"),(8,188,620,64,64,"down1")]:
    k = jax.random.split(jax.random.PRNGKey(0),5)
    x = jax.random.normal(k[1],(B,H,W,Cin),jnp.bfloat16)
    w = (jax.random.normal(k[2],(3,3,Cin,C),jnp.float32)*0.1)
    s = jnp.ones((C,),jnp.float32); t = jnp.zeros((C,),jnp.float32)
    cot = jax.random.normal(k[3],(B,H,W,C),jnp.bfloat16)
    for name in ("pallas","xla"):
        try:
            fwd = jax.jit(lambda x,w,s,t,bk=name: jnp.sum(conv3x3_affine_relu(x,w,s,t,backend=bk).astype(jnp.float32)))
            dt_f = timeit(fwd, x,w,s,t)
            print(json.dumps({"layer":tag,"backend":name,"fwd_ms":round(dt_f*1e3,2)}), flush=True)
        except Exception as e:
            print(json.dumps({"layer":tag,"backend":name,"fwd_error":repr(e)[:400]}), flush=True)
            continue
        try:
            loss = lambda x,w,s,t,c,bk=name: jnp.sum(conv3x3_affine_relu(x,w,s,t,backend=bk).astype(jnp.float32)*c.astype(jnp.float32))
            g = jax.jit(lambda x,w,s,t,c,bk=name: sum(jnp.sum(jnp.abs(q).astype(jnp.float32)) for q in jax.tree_util.tree_leaves(jax.grad(loss,(0,1,2,3))(x,w,s,t,c,bk))))
            dt_b = timeit(g, x,w,s,t,cot)
            print(json.dumps({"layer":tag,"backend":name,"fwdbwd_ms":round(dt_b*1e3,2)}), flush=True)
        except Exception as e:
            print(json.dumps({"layer":tag,"backend":name,"bwd_error":repr(e)[:400]}), flush=True)
