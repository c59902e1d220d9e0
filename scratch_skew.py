"""Skewed-graph SpMM: split vs segment on the real chip. Not committed."""
import time, sys
import numpy as np
import scipy.sparse as sp
import jax, jax.numpy as jnp
from grandtpu.infer import Propagator
from grandtpu.sparse.spmm import BlockCSR, SplitCSR

n, f, order = 300_000, 128, 5
rs = np.random.RandomState(0)
# background: uniform avg degree ~20; hubs: 200 rows with ~15K edges each
bg_e = n * 20
hub_rows = rs.choice(n, 200, replace=False)
hub_r = np.repeat(hub_rows, 15_000)
r = np.concatenate([rs.randint(0, n, bg_e), hub_r])
c = rs.randint(0, n, r.size)
adj = sp.coo_matrix((np.ones(r.size, np.float32), (r, c)), shape=(n, n)).tocsr()
adj.sum_duplicates(); adj.data[:] = 1.0
adj = (adj + sp.eye(n, format="csr")).tocsr()
nnz = adj.nnz
feats = rs.rand(n, f).astype(np.float32)
print(f"nnz={nnz} max_deg={int(np.diff(adj.indptr).max())}", file=sys.stderr)

deg = np.asarray(adj.sum(1)).flatten()
a_norm = sp.diags(1.0 / np.maximum(deg, 1e-12)).dot(adj).tocsr()
b = BlockCSR.from_scipy(a_norm)
s = SplitCSR.from_scipy(a_norm)
print(f"block ovh={b.pad_overhead:.2f}  split ovh={s.pad_overhead:.2f} "
      f"levels={len(s.levels)} lvl_shapes={[tuple(l.cols.shape) for l in s.levels]} "
      f"base_eb={s.base.cols.shape[1]}", file=sys.stderr)

def run(backend, fast):
    prop = Propagator(adj, backend=backend)
    x = jnp.asarray(feats); jax.block_until_ready(x)
    out = prop(x, mode="ppr", order=order, alpha=0.2, fast=fast)
    jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.time()
        out = prop(x, mode="ppr", order=order, alpha=0.2, fast=fast)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{backend:8s} fast={fast}: {best/order*1e3:7.2f} ms/apply "
          f"({nnz*order/best/1e6:6.1f} M edges/s)", file=sys.stderr)
    return np.asarray(out)

o_split = run("block", True)
o_seg = run("segment", False)
o_split32 = run("block", False)
scale = max(np.abs(o_seg).max(), 1e-9)
print(f"split-f32 vs segment max rel err: {np.abs(o_split32-o_seg).max()/scale:.2e}",
      file=sys.stderr)
print(f"split-bf16 vs segment max rel err: {np.abs(o_split-o_seg).max()/scale:.2e}",
      file=sys.stderr)
