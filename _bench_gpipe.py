import time
import numpy as np
import jax, jax.numpy as jnp
from outerspace_tpu.formats import erdos_renyi
from outerspace_tpu.ops.gather_pipeline import plan_spgemm_gather, spgemm_gather_padded, _part_device

def sync(x): return float(np.asarray(x))

g = erdos_renyi(100_000, 100_000, 1e-4, seed=3)
a_csc, b_csr = g.to_csc(), g.to_csr()
t0 = time.perf_counter()
plan = plan_spgemm_gather(a_csc, b_csr)
print(f'plan: {time.perf_counter()-t0:.2f}s, parts={len(plan.parts)}, flops={plan.flops}, padded={plan.padded_total}', flush=True)
for p in plan.parts:
    print(f'  part base={p.row_base} span={p.span} ngroups={p.ngroups} p_real={p.p_real} fb={p.fb_real} merge_pad={p.merge_pad} max_run={p.max_run}', flush=True)

def run_once(bump):
    out = None
    nnz = jnp.int32(0)
    for p in plan.parts:
        dev = dict(p.dev)
        dev['p_real_total'] = jnp.int32(p.p_real + p.fb_real)
        dev['bases'] = dev['bases'] + bump  # dependency injection vs CSE
        r, c, v, valid, pn = _part_device(dev, ngroups=p.ngroups, fb_pad=p.fb_pad,
            merge_pad=p.merge_pad, n_cols=plan.n, sentinel_row=p.span, max_run=p.max_run)
        nnz = nnz + pn
    return nnz

@jax.jit
def run_k():
    nnz = jnp.int32(0)
    for i in range(4):
        nnz = nnz + run_once(nnz * 0)
    return nnz

t0 = time.perf_counter(); total = sync(run_k()); tc = time.perf_counter()-t0
print(f'compile+first: {tc:.1f}s, nnz*4={total}', flush=True)
ts = []
for _ in range(3):
    t0=time.perf_counter(); sync(run_k()); ts.append(time.perf_counter()-t0)
t = (min(ts)-0.03)/4
print(f'er100k gather-pipeline end-to-end: {t*1e3:.1f} ms/spgemm', flush=True)

import scipy.sparse as sp
s = g.to_scipy().tocsr(); cr = s @ s; cr.sum_duplicates()
print('nnz match:', int(total)//4 == cr.nnz, int(total)//4, cr.nnz, flush=True)
# placement-sensitive checksums
m = spgemm_gather_padded(plan)
rr = jnp.where(m.valid, m.rows, 0); cc = jnp.where(m.valid, m.cols, 0); vv = jnp.where(m.valid, m.vals, 0.0)
dev_sums = [sync(jnp.sum(vv)), sync(jnp.sum(rr*vv)), sync(jnp.sum(cc*vv))]
co = cr.tocoo()
host_sums = [cr.data.sum(), (co.row*co.data).sum(), (co.col*co.data).sum()]
print('checksums rel err:', [abs(d-h)/abs(h) for d, h in zip(dev_sums, host_sums)], flush=True)
