"""Which gather formulation keeps the big table row-major + fast rows?
Honest timing: sync via int() fetch (block_until_ready is a no-op on the
axon tunnel platform)."""
import time
import re
import numpy as np
import jax
import jax.numpy as jnp

NROWS, Q, NSTEP = 524288, 2048, 512
rng = np.random.default_rng(0)
base = jnp.asarray(rng.integers(0, 1 << 20, (NROWS, 48), dtype=np.int32))
idx0 = jnp.asarray(rng.integers(0, NROWS, Q, dtype=np.int32))


def meas(name, make_table, gather_fn):
    table = make_table(base)

    def run(table, idx):
        def body(i, carry):
            idx, acc = carry
            rows = gather_fn(table, idx)          # -> [Q, 48]
            s = jnp.sum(rows, axis=1)
            idx = jnp.abs(idx + s + i) % (NROWS - 1)
            return idx, acc + s[0]
        idx, acc = jax.lax.fori_loop(0, NSTEP, body, (idx, jnp.int32(0)))
        return acc

    jf = jax.jit(run)
    try:
        txt = jf.lower(table, idx0).compile().as_text()
        pat = re.findall(r"s32\[524288[^\]]*\]\{([\d,]+)", txt)
        layouts = sorted(set(pat))
        int(jf(table, idx0))
        t0 = time.perf_counter(); int(jf(table, idx0)); t1 = time.perf_counter()
        dt = (t1 - t0) / NSTEP
        print(f"{name:34s} layouts={layouts} {dt*1e6:8.2f} us/step "
              f"{dt/Q*1e9:6.1f} ns/row", flush=True)
    except Exception as e:
        print(f"{name:34s} FAILED: {str(e)[:90]}", flush=True)


meas("2D table[idx]", lambda t: t, lambda t, i: t[i])
meas("2D take promise_in_bounds",
     lambda t: t,
     lambda t, i: jnp.take(t, i, axis=0, mode="promise_in_bounds"))
meas("2D take unique=F sorted=F fill",
     lambda t: t,
     lambda t, i: jnp.take(t, i, axis=0, mode="fill", fill_value=0))
meas("3D [N,6,8]",
     lambda t: t.reshape(NROWS, 6, 8),
     lambda t, i: t[i].reshape(Q, 48))
meas("3D [N,1,48]",
     lambda t: t.reshape(NROWS, 1, 48),
     lambda t, i: t[i].reshape(Q, 48))
meas("3D [N,48,1]",
     lambda t: t.reshape(NROWS, 48, 1),
     lambda t, i: t[i].reshape(Q, 48))
meas("dyslice-vmap",
     lambda t: t,
     lambda t, i: jax.vmap(
         lambda k: jax.lax.dynamic_slice(t, (k, 0), (1, 48))[0])(i))
meas("transposed take axis1",
     lambda t: t.T.copy(),
     lambda t, i: jnp.take(t, i, axis=1).T)
