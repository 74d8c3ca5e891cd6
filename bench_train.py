"""Training-step benchmark on the real chip: step latency / throughput at
bs=16/32 (bf16), and the remat (jax.checkpoint) memory-headroom check —
the largest batch that compiles at 608px with and without train.remat.

    python bench_train.py [throughput|remat]

Timing methodology: N dependent train steps dispatched back-to-back (the
params pytree carries the dependency), fenced once at the end — per-step
time is honest device time plus amortised dispatch (same reasoning as
bench.py's chained forwards; reference train epoch: 187 s for 16.5k
images on 2x1080 Ti, README.md:105).
"""

import sys
import time

import numpy as np


def _setup(batch_size, size, remat=0, model='mobilenetv2-fpn',
           dense_groups=True, gt_mode=True, device_augment=False):
    """gt_mode=True (default) benches the PRODUCTION batch format: uint8
    images + padded GT boxes, normalize + label grids built on device
    (ops/preprocess.py, ops/labels.py). gt_mode=False benches the
    host-label format (pre-built grids, bf16 images) for comparison."""
    import jax
    import jax.numpy as jnp
    from pqdet_tpu.config import default_config
    from pqdet_tpu.model.network import DetectionNetwork
    from pqdet_tpu.ops.labels import label_assigner_from_config
    from pqdet_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from pqdet_tpu.train.schedule import cosine_warmup
    from pqdet_tpu.train.step import (jit_train_step, make_optimizer,
                                      make_train_step)
    from pqdet_tpu.zoo import get_cfg

    net = DetectionNetwork.from_cfg(get_cfg(model))
    params, state = net.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cosine_warmup(2e-4, 1e-6, 500, 50000))
    opt_state = opt.init(params)
    augment_fn = None
    if device_augment:
        from pqdet_tpu.ops.augment_device import (AugmentParams,
                                                  device_augment as _aug)
        ap = AugmentParams(hflip_p=0.5, crop_p=0.75, mosaic_p=0.5,
                           mixup_p=0.5)
        augment_fn = lambda i, g, r: _aug(i, g, r, ap)
    step = make_train_step(net, opt, compute_dtype=jnp.bfloat16, remat=remat,
                           dense_groups=dense_groups,
                           label_fn=label_assigner_from_config(default_config()),
                           augment_fn=augment_fn)
    mesh = make_mesh()
    jstep = jit_train_step(step, mesh)

    rng = np.random.RandomState(0)
    nc, a, gt = 20, 3, 64
    if gt_mode:
        boxes = np.zeros((batch_size, gt, 6), np.float32)
        for i in range(batch_size):
            n = rng.randint(4, 24)
            cxy = rng.rand(n, 2) * (size - 32) + 16
            wh = rng.rand(n, 2) * 120 + 8
            boxes[i, :n, :2] = np.clip(cxy - wh / 2, 0, size - 1)
            boxes[i, :n, 2:4] = np.clip(cxy + wh / 2, 1, size)
            boxes[i, :n, 4] = rng.randint(0, nc, n)
            boxes[i, :n, 5] = 1.0
        batch = {'image': (rng.rand(batch_size, size, size, 3) * 255)
                 .astype(np.uint8),
                 'gt': boxes}
    else:
        tgt = []
        for s in (8, 16, 32):
            g = size // s
            lab = np.zeros((batch_size, g, g, a, 6 + nc), np.float32)
            lab[..., -1] = 1.0
            tgt.append(lab)
        tgt += [np.zeros((batch_size, gt, 4), np.float32) for _ in range(3)]
        batch = {'image': rng.rand(batch_size, size, size, 3)
                 .astype(np.float32).astype(jnp.bfloat16),
                 'targets': tuple(tgt)}
    put = lambda sh: lambda x: jax.device_put(np.asarray(x), sh)
    batch = jax.tree.map(put(batch_sharding(mesh)), batch)
    carry = jax.tree.map(put(replicated(mesh)), (params, state, opt_state))
    return jstep, carry, batch


def throughput():
    for bs in (16, 32):
        for tag, gt_mode in (('gt+u8 ', True), ('grids ', False)):
            jstep, carry, batch = _setup(bs, 512, gt_mode=gt_mode)
            dt = _time_steps(jstep, carry, batch)
            print(f'bs={bs} @512 bf16 [{tag}]: {dt * 1e3:.1f} ms/step '
                  f'({bs / dt:.0f} imgs/s)', flush=True)


def augment_ab(bs=16, size=512):
    """Device-side augmentation step cost: the full train step with
    augment.device's chain (flip/crop/jitter-off/mosaic/mixup) inside the
    jit vs without — the delta is what the chip pays so the 1-core host
    can feed ~1000 imgs/s instead of 216 (tools/bench_loader.py)."""
    for tag, aug in (('no-aug ', False), ('dev-aug', True)):
        jstep, carry, batch = _setup(bs, size, device_augment=aug)
        dt = _time_steps(jstep, carry, batch)
        print(f'bs={bs} @{size} bf16 [{tag}]: {dt * 1e3:.1f} ms/step '
              f'({bs / dt:.0f} imgs/s)', flush=True)


def remat_probe():
    import jax
    for remat in (0, 4):
        fitted = None
        for bs in (256, 320, 384, 448):
            try:
                jstep, (p, s, o), batch = _setup(bs, 608, remat=remat)
                _, _, _, m = jstep(p, s, o, batch, jax.random.PRNGKey(1))
                jax.block_until_ready(m['loss'])
                fitted = bs
                print(f'remat={remat}: bs={bs} @608 ok '
                      f'(loss {float(m["loss"]):.2f})')
            except Exception as e:
                msg = str(e).splitlines()[0][:120]
                print(f'remat={remat}: bs={bs} @608 FAILED: {msg}')
                break
        print(f'remat={remat}: max bs @608 = {fitted}')


# reference train s/epoch on 2x1080 Ti, 16551 VOC trainval images, bs 16x2
# (README.md:105-108) -> imgs/s for the vs_ref column
REF_EPOCH_S = {'mobilenetv2-fpn': 187, 'regnetx-600m-fpn': 163,
               'regnetx-600m-pan': 152, 'regnety-400m-fpn': 192}
VOC_TRAIN_IMGS = 16551


def _time_steps(jstep, carry, batch, n=20):
    import jax
    params, state, opt_state = carry
    rngs = jax.random.split(jax.random.PRNGKey(1), n + 1)
    params, state, opt_state, m = jstep(params, state, opt_state, batch,
                                        rngs[0])
    jax.block_until_ready(m['loss'])  # compile + warmup
    t0 = time.perf_counter()
    for i in range(n):
        params, state, opt_state, m = jstep(params, state, opt_state,
                                            batch, rngs[i + 1])
    jax.block_until_ready(m['loss'])
    return (time.perf_counter() - t0) / n


def zoo(bs=16, models=None, dense_ab=False):
    """Train-step throughput for every zoo model (VERDICT r2 item 2).

    dense_ab additionally times the RegNets with dense_groups=False —
    the raw feature_group_count path — to quantify the train-time
    block-diagonal densification win."""
    models = models or list(REF_EPOCH_S)
    for model in models:
        variants = [('dense', True)]
        if dense_ab and 'regnet' in model:
            variants.append(('grouped', False))
        for tag, dense in variants:
            jstep, carry, batch = _setup(bs, 512, model=model,
                                         dense_groups=dense)
            dt = _time_steps(jstep, carry, batch)
            ref_rate = VOC_TRAIN_IMGS / REF_EPOCH_S[model]
            rate = bs / dt
            print(f'{model:18s} [{tag:7s}] bs={bs} @512 bf16: '
                  f'{dt * 1e3:6.1f} ms/step ({rate:5.0f} imgs/s, '
                  f'{rate / ref_rate:4.1f}x ref {ref_rate:.0f} imgs/s, '
                  f'epoch ~{VOC_TRAIN_IMGS / rate:.0f}s vs '
                  f'{REF_EPOCH_S[model]}s)', flush=True)


def profile(model='mobilenetv2-fpn', bs=32, device_augment=False):
    """Per-op device-time breakdown of one train step (fwd+bwd+opt) from a
    jax.profiler trace (VERDICT r2 item 5). device_augment=True profiles
    the augment.device production step (flips/zoom-crop/mosaic/mixup
    inside the jit)."""
    import jax
    from tools.tpuprof import profile_device_ops

    jstep, carry, batch = _setup(bs, 512, model=model,
                                 device_augment=device_augment)
    params, state, opt_state = carry
    rngs = jax.random.split(jax.random.PRNGKey(1), 9)
    params, state, opt_state, m = jstep(params, state, opt_state, batch,
                                        rngs[0])
    jax.block_until_ready(m['loss'])

    def run():
        p, s, o = params, state, opt_state
        last = None
        for i in range(8):
            p, s, o, last = jstep(p, s, o, batch, rngs[i + 1])
        jax.block_until_ready(last['loss'])

    rows, total = profile_device_ops(run)
    print(f'{model} bs={bs} train step: device {total / 8e3:.2f} ms/step')
    print('-- by category:')
    for r in rows[:18]:
        print(f'  {r["total_us"] / 8:9.1f} us/step x{r["count"]:5d}  '
              f'{r["name"][:70]}')
    instrs = []
    for r in rows:
        for iname, us in r.get('long_names', {}).items():
            instrs.append((us, r.get('samples', {}).get(iname, iname)))
    instrs.sort(key=lambda t: -t[0])
    print('-- top 30 instructions:')
    for us, sample in instrs[:30]:
        print(f'  {us / 8:9.1f} us/step  {sample[:200]}')


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'throughput'
    if mode == 'zoo':
        zoo(bs=int(sys.argv[2]) if len(sys.argv) > 2 else 16,
            dense_ab='--ab' in sys.argv)
    elif mode == 'profile':
        profile(model=sys.argv[2] if len(sys.argv) > 2 else 'mobilenetv2-fpn',
                bs=int(sys.argv[3]) if len(sys.argv) > 3 else 32,
                device_augment='--aug' in sys.argv)
    elif mode == 'augment':
        augment_ab(bs=int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    else:
        {'throughput': throughput, 'remat': remat_probe}[mode]()
