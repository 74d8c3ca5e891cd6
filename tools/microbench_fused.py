"""Hardware A/B of the fused bf16 inverted-residual Pallas kernel
(ops/pallas_fused.py) vs the plain XLA layer walk.

    python tools/microbench_fused.py blocks [bs]   # per-block kernel A/B
    python tools/microbench_fused.py full [bs]     # whole-forward A/B

Per-op times come from jax.profiler traces (wall clock through the axon
tunnel has a ~25 ms dispatch floor, CLAUDE.md); the full-forward mode also
reports chained-jit wall times like bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def block_shapes(model='mobilenetv2-fpn', size=512):
    """(label, h, w, cin, e, cout, has_expand) per fusable chain."""
    import jax
    from pqdet_tpu.model.network import DetectionNetwork
    from pqdet_tpu.ops.pallas_fused import find_fused_triples
    from pqdet_tpu.zoo import get_cfg
    net = DetectionNetwork.from_cfg(get_cfg(model))
    g = net.graph
    out = []
    for a, b, c in find_fused_triples(g):
        nb, nc = g.nodes[b], g.nodes[c]
        hw = size // nb.stride
        cin = g.nodes[a].in_channels if a is not None else nb.in_channels
        out.append((f'{a}/{b}/{c}', hw, hw, cin, nb.in_channels,
                    nc.out_channels, a is not None))
    return net, out


def bench_blocks(bs=16, model='mobilenetv2-fpn'):
    import jax
    import jax.numpy as jnp
    from tools.tpuprof import profile_device_ops
    from pqdet_tpu.ops.pallas_fused import (fused_ir_conv,
                                            fused_ir_reference,
                                            pad_fused_weights)
    _, shapes = block_shapes(model)
    seen = set()
    rng = np.random.RandomState(0)
    print(f'{"block":12s} {"shape":>18s} {"xla us":>8s} {"fused us":>9s} '
          f'{"speedup":>8s}')
    for label, h, w, cin, e, cout, has_e in shapes:
        key = (h, cin, e, cout, has_e)
        if key in seen:
            continue
        seen.add(key)
        x = jnp.asarray(rng.rand(bs, h, w, cin).astype(np.float32),
                        jnp.bfloat16)
        we = (rng.randn(1, 1, cin, e) * 0.1).astype(np.float32) \
            if has_e else None
        be = (rng.randn(e) * 0.1).astype(np.float32) if has_e else None
        wdw = (rng.randn(3, 3, 1, e) * 0.1).astype(np.float32)
        bdw = (rng.randn(e) * 0.1).astype(np.float32)
        wp = (rng.randn(1, 1, e, cout) * 0.1).astype(np.float32)
        bp = (rng.randn(cout) * 0.1).astype(np.float32)
        wep, bep, wdw9, bdwp, wpp, bpp, co = pad_fused_weights(
            we, be, wdw, bdw, wp, bp)

        xla = jax.jit(lambda x: fused_ir_reference(
            x, we, be, wdw, bdw, wp, bp))
        fus = jax.jit(lambda x: fused_ir_conv(
            x, None if wep is None else jnp.asarray(wep),
            None if wep is None else jnp.asarray(bep),
            jnp.asarray(wdw9), jnp.asarray(bdwp), jnp.asarray(wpp),
            jnp.asarray(bpp))[..., :co])

        res = {}
        ok = True
        for tag, fn in (('xla', xla), ('fused', fus)):
            try:
                y = fn(x)
                jax.block_until_ready(y)
            except Exception as ex:
                print(f'{label:12s} {tag} FAILED: '
                      f'{str(ex).splitlines()[0][:90]}')
                ok = False
                break

            def run(fn=fn):
                last = None
                for _ in range(8):
                    last = fn(x)
                jax.block_until_ready(last)
            rows, total = profile_device_ops(run)
            res[tag] = total / 8
        if not ok:
            continue
        # numeric sanity on device
        d = np.abs(np.asarray(xla(x), np.float32)
                   - np.asarray(fus(x), np.float32)).max()
        sp = res['xla'] / max(res['fused'], 1e-9)
        print(f'{label:12s} {h}x{w}x{cin}->{e}->{cout:4d} '
              f'{res["xla"]:8.1f} {res["fused"]:9.1f} {sp:8.2f}x '
              f'maxdiff {d:.3f}', flush=True)


def bench_full(bs=16, model='mobilenetv2-fpn'):
    import jax
    import jax.numpy as jnp
    from tools.tpuprof import profile_device_ops
    from pqdet_tpu.model.network import DetectionNetwork, fuse_params
    from pqdet_tpu.ops.pallas_fused import prepare_fused_ir
    from pqdet_tpu.zoo import get_cfg

    net = DetectionNetwork.from_cfg(get_cfg(model))
    params, state = net.init(jax.random.PRNGKey(0))
    fused = fuse_params(net, params, state)
    fused = jax.tree.map(lambda v: jnp.asarray(v, jnp.bfloat16), fused)
    table = prepare_fused_ir(net, fused)
    print(f'{len(table)} fused blocks')
    x = jnp.asarray(np.random.RandomState(0).rand(bs, 512, 512, 3),
                    jnp.bfloat16)

    for tag, kw in (('plain', {}), ('fused', {'fused_ir': table})):
        @jax.jit
        def fwd(p, x, kw=kw):
            return net.apply(p, {}, x, compute_dtype=jnp.bfloat16, **kw)[0]

        t0 = time.perf_counter()
        y = fwd(fused, x)
        jax.block_until_ready(y)
        print(f'[{tag}] compile {time.perf_counter() - t0:.1f}s')

        def run():
            last = None
            for _ in range(8):
                last = fwd(fused, x)
            jax.block_until_ready(last)
        rows, total = profile_device_ops(run)
        print(f'[{tag}] bs={bs}: device {total / 8e3:.3f} ms/forward')
        for r in rows[:8]:
            print(f'    {r["total_us"] / 8:8.1f} us  {r["name"][:60]}')
        if tag == 'plain':
            y_ref = np.asarray(y, np.float32)
        else:
            d = np.abs(np.asarray(y, np.float32) - y_ref)
            print(f'[fused] maxdiff scores {d[..., 4:].max():.4f} '
                  f'boxes {d[..., :4].max():.2f}')


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'full'
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    {'blocks': bench_blocks, 'full': bench_full}[mode](bs)
