"""Measure scan-rolled multi-step vs per-call stepping. Not committed."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from grandtpu.bench.train_step import CONFIGS
from grandtpu.nn.mlp import MLPConfig, init_mlp
from grandtpu.train.step import StepConfig, build_train_step, make_optimizer

name = "cora-like"
n, f, c, h, nl, bs, ub, ktop = CONFIGS[name]
rs = np.random.RandomState(0)
features = jnp.asarray(rs.rand(n, f).astype(np.float32))
n_src = bs * 4 + ub * 4
tk_cols = jnp.asarray(rs.randint(0, n, (n_src, ktop)).astype(np.int32))
tk_vals = jnp.asarray(rs.rand(n_src, ktop).astype(np.float32))
mlp_cfg = MLPConfig(num_features=f, num_classes=c, hidden=h, nlayers=nl,
                    use_bn=True, input_droprate=0.2, hidden_droprate=0.2)
step_cfg = StepConfig(mlp=mlp_cfg, k_aug=2, dropnode_rate=0.5,
                      n_train=bs, lam=1.0, warmup=100.0, tem=0.1,
                      conf=2.0 / c, loss_kind="l2", clip_norm=-1.0)
optimizer = make_optimizer(1e-3, 1e-4)
params, state = init_mlp(jax.random.PRNGKey(0), mlp_cfg)
opt_state = optimizer.init(params)
step = build_train_step(step_cfg, optimizer)

K = 10
batches = {
    "rows": jnp.asarray(rs.randint(0, n_src, (K, bs + ub)).astype(np.int32)),
    "labels": jnp.asarray(rs.randint(0, c, (K, bs)).astype(np.int32)),
    "label_mask": jnp.ones((K, bs), jnp.float32),
}
key = jax.random.PRNGKey(1)

@jax.jit
def scan_steps(params, state, opt_state, features, tk_cols, tk_vals,
               batches, key, num_batch0):
    def body(carry, xs):
        params, state, opt_state = carry
        batch, k, i = xs
        p, s, o, m = step(params, state, opt_state, features, tk_cols,
                          tk_vals, batch, k, num_batch0 + i)
        return (p, s, o), m
    keys = jax.random.split(key, K)
    idx = jnp.arange(K, dtype=jnp.float32)
    (params, state, opt_state), ms = jax.lax.scan(
        body, (params, state, opt_state), (batches, keys, idx))
    return params, state, opt_state, ms

batch0 = {k: v[0] for k, v in batches.items()}
# warm both
p, s, o, m = step(params, state, opt_state, features, tk_cols, tk_vals,
                  batch0, key, jnp.float32(0))
float(np.asarray(m["loss"]))
p2, s2, o2, ms = scan_steps(params, state, opt_state, features, tk_cols,
                            tk_vals, batches, key, jnp.float32(0))
float(np.asarray(ms["loss"][-1]))

reps = 100
t0 = time.time()
pp, ss, oo = params, state, opt_state
for i in range(reps):
    pp, ss, oo, m = step(pp, ss, oo, features, tk_cols, tk_vals, batch0,
                         key, jnp.float32(i))
float(np.asarray(m["loss"]))
per_call = (time.time() - t0) / reps
print(f"per-call step: {per_call*1e3:.2f} ms/step", file=sys.stderr)

t0 = time.time()
pp, ss, oo = params, state, opt_state
for i in range(reps // K):
    pp, ss, oo, ms = scan_steps(pp, ss, oo, features, tk_cols, tk_vals,
                                batches, key, jnp.float32(i * K))
float(np.asarray(ms["loss"][-1]))
per_scan = (time.time() - t0) / reps
print(f"scan-rolled (K={K}): {per_scan*1e3:.2f} ms/step", file=sys.stderr)
