"""One-shot comprehensive TPU verification job (runs in background)."""
import sys, time, json
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp

out = {}
def log(k, v):
    out[k] = v
    print(k, '=', v, flush=True)

t0=time.time()
r = jax.jit(lambda a, b: a + b)(jnp.ones((8,128)), jnp.ones((8,128)))
r.block_until_ready()
log('jit_add_s', round(time.time()-t0,1))

rng = np.random.default_rng(0)
num = rng.random((80,128)).astype(np.float32)*4000-2000
den = rng.random((80,128)).astype(np.float32)*4000-2000
den = np.where(np.abs(den)<1, 1.0, den).astype(np.float32)
q = np.asarray(jax.jit(lambda a, b: a / b)(jnp.array(num), jnp.array(den)))
log('div_mismatch', int((q != num/den).sum()))
d = rng.random((80,128)).astype(np.float32)*4e6
s = np.asarray(jax.jit(jnp.sqrt)(jnp.array(d)))
log('sqrt_mismatch', int((s != np.sqrt(d)).sum()))
ax, t, bx, p0 = (rng.random((80,128)).astype(np.float32)*2000-1000 for _ in range(4))
t = np.abs(t)/1000
pv = np.asarray(jax.jit(lambda ax,t,bx,p0: (ax*t+bx)*t+p0)(*map(jnp.array,(ax,t,bx,p0))))
pn = (ax*t+bx)*t+p0
fma = lambda a,b,c: (np.float64(a)*np.float64(b)+np.float64(c)).astype(np.float32)
pf = fma(fma(ax,t,bx),t,p0)
log('poly_vs_plain', int((pv!=pn).sum())); log('poly_vs_fma', int((pv!=pf).sum()))

# rsqrt-style reciprocal probe: is div implemented as a*rcp(b)?
rcp = np.asarray(jax.jit(lambda b: 1.0 / b)(jnp.array(den)))
log('rcp_mismatch', int((rcp != np.float32(1.0)/den).sum()))

# --- pallas winding parity + tie classification ---
from fontrx.font.font import Font
from fontrx.pack.segments import glyph_segments
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels import oracle
from fontrx.kernels.winding_pallas import winding_pallas_grid

f = Font.open('/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf')
tot = {'pix':0, 'mm':0, 'mm_edge':0}
for ch in 'AQg@&%MW':
    g, _ = f.get_glyph(ch)
    seg = glyph_segments(g)
    grid = RasterGrid.for_glyph_box((g.box.x_min,g.box.y_min,g.box.x_max,g.box.y_max), 256, f.info.units_per_em)
    wp = np.asarray(winding_pallas_grid(seg, grid))
    wo = oracle.winding_map(seg, grid)
    mm = wo != wp
    # edge classification: a mismatch is an outline tie if a 4-neighbor
    # differs in the oracle map (winding transition adjacent)
    trans = np.zeros_like(mm)
    trans[1:,:]  |= wo[1:,:] != wo[:-1,:]
    trans[:-1,:] |= wo[1:,:] != wo[:-1,:]
    trans[:,1:]  |= wo[:,1:] != wo[:,:-1]
    trans[:,:-1] |= wo[:,1:] != wo[:,:-1]
    tot['pix'] += mm.size; tot['mm'] += int(mm.sum()); tot['mm_edge'] += int((mm & trans).sum())
    print(ch, 'mismatch', int(mm.sum()), 'of', mm.size, 'all-on-edge:', bool((mm <= trans).all()), flush=True)
log('parity', tot)

# --- perf at realistic shapes ---
from fontrx.kernels.winding_pallas import winding_pallas_batch
from fontrx.engine.atlas import pack_charset
batch = pack_charset(f, [c for c in range(33,127)])
grids = [RasterGrid.fixed_tile(tuple(b), 256, 2048, 256) for b in np.asarray(batch.boxes)]
mx = jnp.array([g.min_x for g in grids], jnp.int32); my = jnp.array([g.max_y for g in grids], jnp.int32)
segs = jnp.array(batch.segments)
t0=time.time()
o = winding_pallas_batch(segs, mx, my, jnp.float32(grids[0].scale), height=256, width=256)
o.block_until_ready()
log('ascii_compile_s', round(time.time()-t0,1))
t0=time.time(); n=20
for _ in range(n):
    o = winding_pallas_batch(segs, mx, my, jnp.float32(grids[0].scale), height=256, width=256)
    o.block_until_ready()
dt=(time.time()-t0)/n
log('ascii_glyphs_per_s', round(94/dt,1))
log('ascii_ms', round(dt*1e3,2))
json.dump(out, open('/root/repo/.tpuprobe/results.json','w'), indent=1)
print('DONE', flush=True)
