"""Trainer: the full training loop (reference trainer.py:18-368).

Per-epoch flow parity: multi-scale host batches -> jitted sharded train
step (one jit cache entry per input size) -> loss meters with 1/5-epoch
dashboard prints -> eval past eval.after -> checkpoint each epoch (AP in
the filename). Sparse training adds the BN-gamma L1 grad transform and the
quantile printout; QAT threads fake-quant hooks with the observer/BN freeze
schedule; run_prune / run_nas apply the reference's fine-tune presets.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pqdet_tpu.config import resolve_model_cfg
from pqdet_tpu.data.eval_data import EvalData
from pqdet_tpu.data.train_data import TrainData, epoch_batches
from pqdet_tpu.evaluation.evaluator import Evaluator, format_ap_table
from pqdet_tpu.model.factory import build_detector, inference_params
from pqdet_tpu.parallel.mesh import (batch_sharding, make_mesh, replicated)
from pqdet_tpu.train.checkpoint import save_checkpoint
from pqdet_tpu.train.schedule import build_schedule
from pqdet_tpu.train.step import (jit_train_step, make_optimizer,
                                  make_train_step, sparse_bn_gamma_ids)
from pqdet_tpu.utils.meters import AverageMeter, TicToc


class Trainer:

    def __init__(self, config):
        self.config = config
        self.cfg_text: Optional[str] = None
        self.AP = None
        self.global_step = 0
        self.init_epoch = 0
        self._eval_run = None  # jitted eval pipeline, per network/config

        c = config
        self._max_epochs = c.train.max_epochs
        self._warmup_epochs = c.train.warmup_epochs
        self._init_lr = c.train.learning_rate_init
        self._eval_after = c.eval.after
        self._sparse = c.sparse.switch
        self._sparse_ratio = c.sparse.ratio
        self._quant = c.quant.switch
        # QAT phase flags, read at trace time by the quant step (run()
        # updates them per epoch; init here so run_nas/train_epoch-only
        # paths work too)
        self._observing = True
        self._bn_frozen = False
        self._weights_dir = os.path.join(c.weight.dir, c.experiment_name)
        self._weight_base_name = 'model'
        self._resume = c.weight.resume
        self._backbone = c.weight.backbone
        self._clear_history = c.weight.clear_history
        self._num_workers = c.system.num_workers
        self._compute_dtype = {'float32': None,
                               'bfloat16': jnp.bfloat16}[c.system.compute_dtype]

        self.dataload_tt = TicToc()
        self.model_tt = TicToc()
        self.epoch_tt = TicToc()

    # ------------------------------------------------------------------ init

    def init_all(self):
        if self.cfg_text is None:
            self.cfg_text = resolve_model_cfg(self.config)
        from pqdet_tpu.parallel.mesh import fit_mesh_to_batch
        # multi-host: caller ran parallel.mesh.init_multihost first, so
        # jax.devices() spans the whole slice; the mesh is GLOBAL, each host
        # loads its slice of every batch (TrainData host args below) and
        # train_epoch assembles global arrays from the local shards
        self._n_proc = jax.process_count()
        self._is_main = jax.process_index() == 0
        if self._n_proc > 1:
            n_global = len(jax.devices())
            if self.config.train.batch_size % n_global:
                raise ValueError(
                    f'multi-host run: train.batch_size='
                    f'{self.config.train.batch_size} must be divisible by '
                    f'the {n_global} global devices')
            self.mesh = make_mesh(0)
        else:
            n_dev = fit_mesh_to_batch(self.config.train.batch_size,
                                      self.config.system.data_devices)
            self.mesh = make_mesh(n_dev)
        self._spatial = int(getattr(self.config.train, 'spatial', 0))
        if self._spatial > 1:
            # (data x space) mesh: images also shard their height axis
            # (parallel/mesh.py make_mesh_2d). gt-mode batches only.
            from pqdet_tpu.parallel.mesh import (make_mesh_2d,
                                                 spatial_batch_shardings)
            if self._n_proc > 1:
                raise ValueError('train.spatial is single-host scoped')
            if getattr(self.config.system, 'label_assign', 'host') != 'device':
                raise ValueError("train.spatial needs "
                                 "system.label_assign='device'")
            if getattr(self.config.train, 'unroll_steps', 1) > 1:
                raise ValueError('train.spatial excludes unroll_steps > 1')
            # honor system.data_devices as the TOTAL device budget, like
            # the non-spatial path above
            avail = self.config.system.data_devices or len(jax.devices())
            n_data = fit_mesh_to_batch(self.config.train.batch_size,
                                       max(avail // self._spatial, 1))
            self.mesh = make_mesh_2d(n_data, self._spatial)
            self._data_sh = spatial_batch_shardings(self.mesh)
        else:
            self._data_sh = batch_sharding(self.mesh)
        self._repl = replicated(self.mesh)

        self.train_data = TrainData(self.config, num_hosts=self._n_proc,
                                    host_id=jax.process_index())
        self.eval_data = EvalData(self.config)
        self.steps_per_epoch = self.train_data.batches_per_epoch
        self._print_interval = max(self.steps_per_epoch // 5, 1)
        print(f'{self.train_data.length} images for train.')
        print(f'{self.eval_data.length} images for evaluate.')

        self.network, params, state, info = build_detector(
            self.cfg_text, weight_path=self._resume or None,
            backbone_path=self._backbone or None,
            clear_history=self._clear_history, qat=self._quant)
        self.global_step = info['step']
        self.init_epoch = self.global_step // self.steps_per_epoch
        if self._resume:
            print(f'resumed at {self.global_step} steps from {self._resume}')

        schedule = build_schedule(self.config, self.steps_per_epoch)
        self.schedule = schedule
        self.optimizer = make_optimizer(schedule,
                                        self.config.train.weight_decay,
                                        self.config.train.grad_clip)
        opt_state = self.optimizer.init(params)
        if self.global_step:
            from pqdet_tpu.train.step import resume_schedule_step
            opt_state = resume_schedule_step(opt_state, self.global_step)

        sparse_ids = sparse_bn_gamma_ids(self.network) if self._sparse else None
        if self._sparse:
            n_all = sum(1 for n in self.network.graph.nodes if n.has_bn)
            print(f'sparse mode: {len(sparse_ids)}/{n_all} BN layers will be sparsed.')
        self._sparse_ids = sparse_ids

        self._unroll = max(getattr(self.config.train, 'unroll_steps', 1), 1)
        if self._unroll > 1:
            # stacked groups carry a leading scan axis before the batch dim
            from jax.sharding import NamedSharding, PartitionSpec
            from pqdet_tpu.parallel.mesh import DATA_AXIS
            self._data_sh = NamedSharding(self.mesh,
                                          PartitionSpec(None, DATA_AXIS))

        def _jit(step_fn):
            from pqdet_tpu.train.step import make_multi_step
            if self._unroll > 1:
                step_fn = make_multi_step(step_fn, self._unroll)
            # _data_sh doubles as the explicit batch sharding (per-leaf
            # pytree under train.spatial, plain batch sharding otherwise)
            return jit_train_step(step_fn, self.mesh, unroll=self._unroll,
                                  batch_shardings=self._data_sh)

        from pqdet_tpu.ops.labels import label_assigner_from_config
        self._label_fn = label_assigner_from_config(self.config)
        self._augment_fn = None
        if getattr(self.config.augment, 'device', False):
            from pqdet_tpu.ops.augment_device import augmenter_from_config
            self._augment_fn = augmenter_from_config(self.config)
        self._device_cache = None
        _fp = str(getattr(self.config.augment, 'fresh_partners', 'auto')
                  ).lower()
        if _fp in ('on', 'true', '1', 'yes') \
                and not getattr(self.config.dataset, 'device_cache', False):
            raise ValueError('augment.fresh_partners=on gathers partner '
                             'rows from the HBM corpus: set '
                             'dataset.device_cache on (host loaders would '
                             "pay 4-5x the sample cost; 'auto' falls back "
                             'to in-batch partners without the cache)')
        if getattr(self.config.dataset, 'device_cache', False):
            if self._augment_fn is None or self._n_proc > 1 \
                    or self._unroll > 1 or self._spatial > 1:
                raise ValueError(
                    'dataset.device_cache needs augment.device=on, a '
                    'single host, and no unroll/spatial partitioning')
            self._build_device_cache()
        if self._quant:
            # jit specialises on the observer/BN-freeze phase flags; the
            # step is re-jitted when the schedule flips them (the closure
            # reads them at trace time)
            self._make_jstep = lambda: _jit(self._wrap_quant_step())
        else:
            step_fn = make_train_step(
                self.network, self.optimizer,
                sparse_ratio=self._sparse_ratio if self._sparse else 0.0,
                sparse_ids=sparse_ids, compute_dtype=self._compute_dtype,
                remat=int(getattr(self.config.train, 'remat', 0)),
                label_fn=self._label_fn, augment_fn=self._augment_fn,
                probe_heads=bool(getattr(self.config.train,
                                         'head_probe', True)),
                s2d_stem=int(getattr(self.config.train, 's2d_stem', 0)))
            self._make_jstep = lambda: _jit(step_fn)
        self.jstep = self._make_jstep()

        put = lambda t: jax.tree.map(lambda x: jax.device_put(x, self._repl), t)
        self.params, self.state, self.opt_state = put((params, state, opt_state))
        self.losses = {
            'loss': AverageMeter(), 'giou_loss': AverageMeter(),
            'conf_loss': AverageMeter(), 'class_loss': AverageMeter(),
            'loss_per_branch': [AverageMeter() for _ in range(3)],
        }
        self._rng = jax.random.PRNGKey(42)

    def _wrap_quant_step(self):
        """QAT train step: fake-quant forward with observer updates folded
        into the state pytree. The observing flag is a static python bool,
        giving one jit specialisation per phase."""
        import optax
        from pqdet_tpu.compress.qat import QuantCtx
        network, optimizer = self.network, self.optimizer
        compute_dtype = self._compute_dtype
        trainer = self

        def step_fn(params, state, opt_state, batch, rng):
            observing = trainer._observing  # static per jit cache entry

            def loss_fn(p):
                from pqdet_tpu.ops.preprocess import device_normalize
                ctx = QuantCtx(state['quant'], observing=observing)
                net_rng = rng
                if trainer._augment_fn is not None and 'gt' in batch:
                    # split BOTH ways: handing the parent key to the
                    # network would correlate dropout masks with the
                    # augment draws (net's carried key == split(rng)[0])
                    arng, net_rng = jax.random.split(rng)
                    if 'partner_image' in batch:
                        raw, gt = trainer._augment_fn(
                            batch['image'], batch['gt'], arng,
                            batch['partner_image'], batch['partner_gt'])
                    else:
                        raw, gt = trainer._augment_fn(batch['image'],
                                                      batch['gt'], arng)
                    image = device_normalize(raw)
                    targets = trainer._label_fn(gt, image.shape[1:3])
                else:
                    image = device_normalize(batch['image'])
                    targets = batch['targets'] if 'targets' in batch \
                        else trainer._label_fn(batch['gt'], image.shape[1:3])
                losses, new_state = network.apply(
                    p, state, image,
                    targets=targets,
                    train=not trainer._bn_frozen, rng=net_rng,
                    compute_dtype=compute_dtype, quant_ctx=ctx)
                new_state['quant'] = ctx.new_obs
                return losses['loss'][0], (losses, new_state)

            (loss, (losses, new_state)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {
                'loss': losses['loss'][0],
                'giou_loss': losses['giou_loss'][0],
                'conf_loss': losses['conf_loss'][0],
                'class_loss': losses['class_loss'][0],
                'loss_per_branch': jnp.stack([l[0] for l in losses['loss_per_branch']]),
            }
            return params, new_state, opt_state, metrics

        return step_fn

    # ----------------------------------------------------------------- eval

    def make_predict_fn(self):
        """(batch dict) -> list of per-image (M, 6) numpy detections. The
        jitted pipeline is built once and reused by every per-epoch
        evaluation (rebuilding it would re-jit per epoch).

        QAT runs evaluate the CONVERTED int8 model through the int8
        executor — the number that actually matters after conversion —
        mirroring the reference, which evals tools.quantized_model during
        QAT (reference trainer.py:313, tools.py:291-304). The first blind
        clutter ladder measured fake-quant-free fp AP per epoch and the
        converted model's collapse to 0.0 was invisible until the final
        convert step."""
        from pqdet_tpu.evaluation.predict import (build_predict_pipeline,
                                                  make_batch_predict)
        if self._quant:
            from pqdet_tpu.compress.quantized import (Int8Inference,
                                                      convert_to_int8)
            params, state = jax.device_get((self.params, self.state))
            qparams = convert_to_int8(self.network, params, state)
            int8 = Int8Inference(self.network, mode='pallas',
                                 act=qparams['act'])
            # act scales are baked into the jit as constants and change
            # between epochs while observers run, so the pipeline cannot
            # be cached across evals like the fp one below
            run = build_predict_pipeline(
                self.network, self.config,
                apply_fn=lambda p, x: int8.apply(p, x))
            return make_batch_predict(run, Int8Inference.prepare(
                qparams, mode='pallas', network=self.network))
        if self._eval_run is None:
            self._eval_run = build_predict_pipeline(
                self.network, self.config, compute_dtype=self._compute_dtype)
        params, state = self.params, self.state
        if getattr(self, '_n_proc', 1) > 1:
            # eval runs host-local on the main process: pull the (fully
            # replicated, hence addressable) global params to host so the
            # local jit re-stages them on this host's devices
            params, state = jax.device_get((params, state))
        fused = inference_params(self.network, params, state)
        return make_batch_predict(self._eval_run, fused)

    def evaluate(self):
        evaluator = Evaluator(self.make_predict_fn(), self.eval_data, self.config)
        ap = evaluator.evaluate()
        self.AP = ap
        print(format_ap_table(ap, verbose=False))
        return ap

    # ------------------------------------------------------------------ save

    def save(self, epoch: int):
        name = f'{self._weight_base_name}-{epoch}.ckpt' if self.AP is None \
            else f'{self._weight_base_name}-{epoch}-{self.AP.AP:.4f}.ckpt'
        path = os.path.join(self._weights_dir, name)
        save_checkpoint(
            path, self.params, self.state, step=self.global_step,
            cfg_text=self.cfg_text,
            ap=None if self.AP is None else self.AP.AP,
            ckpt_type='qat' if self._quant else 'normal',
            backend='int8' if self._quant else 'none')
        return path

    # ----------------------------------------------------------------- train

    def _flush_metrics(self, epoch: int, pending, final: bool = False):
        """Materialise buffered device metrics with a FIXED number of
        device fetches. ``jax.device_get(pending)`` fetched every scalar
        individually — ~9 tiny arrays x interval steps x ~25 ms tunnel
        latency each made the flush itself ~half the round-3 epoch wall
        (model_tt 106 s/epoch against ~18 s of device time). Stacking on
        device first costs a handful of async dispatches and exactly FIVE
        fetches per flush. NaN detection still happens here, within one
        print interval of the bad step."""
        if not pending:
            return
        # derive the metric set from the step's own output (a step variant
        # that adds/renames a key must not be silently dropped or blow up
        # only at flush time); the dashboard below still needs the core 5
        names = tuple(pending[0].keys())
        missing = {'loss', 'giou_loss', 'conf_loss', 'class_loss',
                   'loss_per_branch'} - set(names)
        assert not missing, f'train step metrics missing {missing}'
        stacked = {name: jnp.stack([jnp.ravel(m[name]) for m in pending])
                   for name in names}
        host_stacked = jax.device_get(stacked)
        host = [{name: host_stacked[name][j] for name in names}
                for j in range(len(pending))]
        pending.clear()
        for m in host:
            # metrics may be single-step (scalars) or scan-stacked (K, ...)
            losses = np.asarray(m['loss']).reshape(-1)
            k = losses.size
            branch = np.asarray(m['loss_per_branch']).reshape(k, -1)
            scalars = {name: np.asarray(m[name]).reshape(-1)
                       for name in names
                       if name not in ('loss', 'loss_per_branch')}
            for step_i in range(k):
                loss_val = float(losses[step_i])
                if not np.isfinite(loss_val):
                    msg = f'NaN in loss near step {self.global_step}'
                    if 'head_max' in m:
                        # per-scale head-input |act| history up to death:
                        # names WHICH head overflowed first (raw offsets
                        # past ~88.7 overflow decode's exp; the survival
                        # knob is the yolo attr exp_cap, model/decode.py).
                        # Post-death steps are all-NaN, so show the LAST
                        # FINITE rows + where the first bad row sits.
                        hist = np.concatenate(
                            [np.asarray(mm['head_max']).reshape(
                                -1, np.asarray(mm['head_max']).shape[-1])
                             for mm in host if 'head_max' in mm])
                        fin = np.isfinite(hist).all(axis=1)
                        last_fin = np.round(hist[fin][-3:], 1).tolist()
                        first_bad = int(np.argmax(~fin)) if (~fin).any() \
                            else -1
                        msg += (f'; head-input max|act| per scale, last '
                                f'finite rows {last_fin}, first '
                                f'non-finite step {first_bad}/{len(hist)} '
                                f'of the flushed interval')
                    raise RuntimeError(msg)
                self.losses['loss'].update(loss_val)
                for name, vals in scalars.items():
                    self.losses.setdefault(name, AverageMeter()) \
                        .update(float(vals[step_i]))
                for i in range(branch.shape[1]):
                    self.losses['loss_per_branch'][i].update(
                        float(branch[step_i, i]))
        if not final:
            vals = {k: v.get_avg_reset() for k, v in self.losses.items()
                    if not isinstance(v, list)}
            branch = [b.get_avg_reset() for b in self.losses['loss_per_branch']]
            lr = float(self.schedule(self.global_step))
            print(f'lr: {lr:.6f}\tepoch: {epoch}/{self._max_epochs}\t'
                  f'step: {self.global_step}\t'
                  f'train_loss: {vals["loss"]:.2f}='
                  f'{branch[0]:.2f}+{branch[1]:.2f}+{branch[2]:.2f}'
                  f'(xy: {vals["giou_loss"]:.2f}, conf: {vals["conf_loss"]:.2f}, '
                  f'cls: {vals["class_loss"]:.2f})')

    def _grouped_batches(self):
        """Yield (host batch, steps) pairs: single batches at unroll=1,
        else groups of unroll same-size batches stacked on a leading scan
        axis. TrainData rounds its epoch plan up to whole groups, so the
        ragged-tail padding below is defensive only and global_step stays
        consistent with steps_per_epoch."""
        unroll = self._unroll
        it = self._epoch_iter()
        if unroll == 1:
            for batch in it:
                yield batch, 1
            return
        group = []
        for batch in it:
            group.append(batch)
            if len(group) == unroll:
                yield self._stack_group(group), unroll
                group = []
        if group:
            while len(group) < unroll:
                group.append(group[-1])
            yield self._stack_group(group), unroll

    def _epoch_iter(self):
        """One epoch of host batches through the configured loader.
        system.loader='process' uses the persistent spawn pool + shared
        memory (scales past the GIL on multi-core hosts); 'thread' is the
        low-overhead default matching the reference's DataLoader threads
        (reference trainer.py:60-64)."""
        if getattr(self.config.system, 'loader', 'thread') == 'process':
            if getattr(self, '_proc_loader', None) is None:
                from pqdet_tpu.data.train_data import ProcessLoader
                self._proc_loader = ProcessLoader(
                    self.train_data, self._num_workers,
                    prefetch=max(self.config.system.prefetch, 2))
            return self._proc_loader.epoch()
        return epoch_batches(self.train_data, self._num_workers,
                             prefetch=self.config.system.prefetch)

    def close(self):
        """Release loader workers/slabs (no-op for the thread loader)."""
        pl = getattr(self, '_proc_loader', None)
        if pl is not None:
            pl.close()
            self._proc_loader = None

    @staticmethod
    def _stack_group(group):
        return jax.tree.map(lambda *xs: np.stack(xs), *group)

    def _put_batch(self, batch):
        """Host batch -> device arrays with the data sharding. Multi-host:
        this host's local slice becomes its shards of the GLOBAL batch
        (each host loaded rows [h*B/H, (h+1)*B/H) of the shared epoch plan).

        uint8 batches (the default train pipeline: augment chains stay
        uint8 end-to-end and normalization runs on device,
        ops/preprocess.py) upload raw — 4x fewer bytes than f32 and zero
        host-side float passes. Float batches (hand-built, or host-side
        Normalize chains) are cast to the compute dtype on the HOST:
        the model casts its input anyway, so uploading bf16 instead of
        f32 halves host->device bytes with identical numerics (same
        round-to-nearest, just moved across the transfer)."""
        if self._compute_dtype is not None \
                and batch['image'].dtype != np.uint8:
            batch = {**batch,
                     'image': batch['image'].astype(self._compute_dtype)}
        if self._n_proc > 1:
            from pqdet_tpu.parallel.mesh import host_local_batch_to_global
            return host_local_batch_to_global(self.mesh, batch, self._data_sh)
        if isinstance(self._data_sh, dict):  # train.spatial: per-leaf
            return jax.tree.map(
                lambda x, sh: jax.device_put(jnp.asarray(x), sh),
                batch, self._data_sh)
        return jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), self._data_sh), batch)

    # ------------------------------------------------- device data cache

    # process-wide memo: drivers that build one Trainer per short run
    # (hyper-evolution, NAS) must not re-upload the corpus every round
    _CACHE_MEMO = {}

    def _build_device_cache(self):
        """Decode + letterbox every train image ONCE at the largest
        input size and park the whole corpus in HBM (dataset.device_cache).
        Steps then upload ~100 B of indices instead of ~12.6 MB of pixels
        — on thin host<->device links (the axon tunnel measures
        15-100 MB/s) the per-step transfer IS the training wall clock.
        Chunked donated dynamic_update_slice writes keep peak HBM at
        cache size + one chunk."""
        import time as _time
        data = self.train_data
        from pqdet_tpu.config import sizes_fix
        smax = max(h for h, w in sizes_fix(self.config.train.input_sizes))
        memo_key = (self.config.dataset.train_txt_file,
                    self.config.dataset.name, smax, data._max_gt)
        hit = Trainer._CACHE_MEMO.get(memo_key)
        if hit is not None:
            self._device_cache = dict(hit, gather={})
            print(f'device cache: reusing HBM-resident corpus '
                  f'({hit["img"].shape[0]} images @ {smax}px)', flush=True)
            return
        n = data._num_imgs
        t0 = _time.time()
        cache = jax.jit(lambda b, c, i: jax.lax.dynamic_update_slice(
            b, c, (i, 0, 0, 0)), donate_argnums=0)
        img_cache = jnp.zeros((n, smax, smax, 3), jnp.uint8)
        gt_host = np.zeros((n, data._max_gt, 6), np.float32)
        chunk = max(1, (64 << 20) // (smax * smax * 3))  # ~64 MB uploads
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            imgs = np.empty((hi - lo, smax, smax, 3), np.uint8)
            for j in range(lo, hi):
                img, gt = data.build_sample(j, (smax, smax))
                imgs[j - lo] = img
                gt_host[j] = gt
            img_cache = cache(img_cache, jnp.asarray(imgs), lo)
            if lo == 0 or hi == n or (lo // chunk) % 10 == 0:
                print(f'device cache: {hi}/{n} images', flush=True)
        jax.block_until_ready(img_cache)
        self._device_cache = {
            'img': img_cache,
            'gt': jax.device_put(gt_host),
            'smax': smax,
            'gather': {},
        }
        Trainer._CACHE_MEMO.clear()  # at most one resident corpus
        Trainer._CACHE_MEMO[memo_key] = {
            k: self._device_cache[k] for k in ('img', 'gt', 'smax')}
        print(f'device cache built: {n} images @ {smax}px '
              f'({n * smax * smax * 3 / 1e9:.1f} GB HBM) '
              f'in {_time.time() - t0:.0f}s', flush=True)

    def _cache_gather(self, size: int):
        """Jitted (img_cache, gt_cache, idx) -> batch at `size`: gather
        the batch rows; smaller multi-scale sizes bilinear-resize the
        letterboxed max-size image (aspect-preserving, so this matches
        letterboxing the source at `size` up to resample rounding) and
        scale the boxes."""
        fns = self._device_cache['gather']
        if size not in fns:
            smax = self._device_cache['smax']

            def gather(img_cache, gt_cache, idx):
                imgs = img_cache[idx]
                gts = gt_cache[idx]
                if size != smax:
                    r = size / smax
                    # antialias=False: cv2.INTER_LINEAR (the host letterbox
                    # this replaces) does not antialias on downscale; the
                    # default antialiased filter measurably softens images
                    # (Laplacian-var p50 147 -> 59, reports/aug_stats_r5)
                    imgs = jax.image.resize(
                        imgs.astype(jnp.float32),
                        (idx.shape[0], size, size, 3), 'bilinear',
                        antialias=False)
                    imgs = jnp.clip(jnp.round(imgs), 0, 255
                                    ).astype(jnp.uint8)
                    gts = gts * jnp.asarray([r, r, r, r, 1., 1.],
                                            jnp.float32)
                return {'image': imgs, 'gt': gts}

            # gather output lands batch-sharded like _put_batch uploads
            # would (jstep declares data-axis in_shardings; without this a
            # single-host multi-device data mesh pays a silent device-0
            # gather + reshard every step)
            fns[size] = jax.jit(gather, out_shardings={
                'image': self._data_sh, 'gt': self._data_sh})
        return fns[size]

    def _cached_batches(self):
        """(device batch, steps) pairs gathered from the HBM-resident
        corpus — the dataset.device_cache replacement for
        _device_batches (host upload = the index vector).

        augment.fresh_partners: each batch also gathers n*B FRESH uniform
        corpus rows as mosaic/mixup partners (host-parity independent
        draws, ops/augment_device.py) — the in-batch permutation
        otherwise reuses the step's own augmented instances."""
        from pqdet_tpu.ops.augment_device import partner_rows_per_sample
        data = self.train_data
        cache = self._device_cache
        n_partner = partner_rows_per_sample(self.config) \
            if self._augment_fn is not None else 0
        prng = np.random.RandomState(
            getattr(self.config.system, 'seed', 0) + 7)
        for k, rows in enumerate(data.batch_indices()):
            s = int(data._sizes[k][0])  # (h, w) square sizes
            idx = np.asarray([data._indexes[i] for i in rows], np.int32)
            batch = self._cache_gather(s)(cache['img'], cache['gt'],
                                          jnp.asarray(idx))
            if n_partner:
                pidx = prng.randint(0, data._num_imgs,
                                    size=n_partner * len(rows))
                pb = self._cache_gather(s)(cache['img'], cache['gt'],
                                           jnp.asarray(pidx, jnp.int32))
                batch = {**batch, 'partner_image': pb['image'],
                         'partner_gt': pb['gt']}
            yield batch, 1

    # dispatches kept in flight before fencing: preserves host/device
    # overlap while bounding queued input batches in HBM (an unbounded
    # queue OOMs mid-epoch when the data pipeline outruns the device)
    PIPELINE_DEPTH = 4

    def _device_batches(self):
        """Yield (device batch, steps) with the host->device upload of the
        NEXT group overlapped with the current step's compute: a background
        thread runs _put_batch ahead of consumption. On the axon tunnel an
        upload costs ~wire time for ~11 MB/batch; the round-3 ladder ran
        ~470 ms/step wall against ~45 ms device time because upload and
        dispatch serialised in one loop. Batch order (and therefore RNG
        consumption and global_step accounting) is unchanged; the queue
        depth bounds extra HBM-resident input batches."""
        import queue
        import threading

        if self._device_cache is not None:
            yield from self._cached_batches()
            return
        depth = max(int(getattr(self.config.system, 'device_prefetch', 2)), 0)
        if depth == 0:  # opt-out: synchronous upload in the consumer loop
            for batch, steps in self._grouped_batches():
                yield self._put_batch(batch), steps
            return
        q = queue.Queue(maxsize=depth)
        err = []
        stop = threading.Event()

        def work():
            try:
                for batch, steps in self._grouped_batches():
                    item = (self._put_batch(batch), steps)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surfaced in the consumer below
                err.append(e)
            finally:
                try:
                    q.put_nowait(None)
                except queue.Full:
                    pass  # consumer is draining/abandoning; stop is set

        t = threading.Thread(target=work, daemon=True,
                             name='device-prefetch')
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            # if the consumer abandons mid-epoch (train-step exception,
            # early break), unblock the worker's pending put and drop its
            # HBM-pinned batches — otherwise each failed epoch wedges a
            # thread holding `depth` device-resident batches
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.2)
        if err:
            raise err[0]

    def train_epoch(self, epoch: int):
        pending = []
        in_flight = []
        self.dataload_tt.tic()
        for batch, steps in self._device_batches():
            self.global_step += steps
            self.dataload_tt.toc()

            self.model_tt.tic()
            self._rng, rng = jax.random.split(self._rng)
            if steps > 1:
                rng = jax.random.split(rng, steps)
            self.params, self.state, self.opt_state, metrics = self.jstep(
                self.params, self.state, self.opt_state, batch, rng)
            pending.append(metrics)  # device scalars; sync'd in bulk below
            in_flight.append(metrics['loss'])
            if len(in_flight) > self.PIPELINE_DEPTH:
                # fence the oldest outstanding step; amortised device time
                # lands in model_tt (shifted by PIPELINE_DEPTH steps)
                jax.block_until_ready(in_flight.pop(0))
            self.model_tt.toc()

            if self.global_step % self._print_interval < steps:
                self._flush_metrics(epoch, pending)

            self.dataload_tt.tic()
        self._flush_metrics(epoch, pending, final=True)
        jax.block_until_ready(self.params)

        self.train_data.init_shuffle()

        if self._sparse:
            gammas = np.sort(np.concatenate([
                np.abs(np.asarray(self.params[i]['bn']['gamma']))
                for i in self._sparse_ids]))
            idx = [round(i / 5 * len(gammas)) - 1 for i in range(1, 6)]
            print('sparse level: {}'.format(gammas[idx].tolist()))

        print('data load time: {:.3f}s, model train time: {:.3f}s'.format(
            self.dataload_tt.sum_reset() / 1e9, self.model_tt.sum_reset() / 1e9))

    def train(self):
        for epoch in range(self.init_epoch, self._max_epochs):
            self.AP = None
            if self._quant:
                flags = (epoch < self.config.quant.disable_observer_after,
                         epoch >= self.config.quant.freeze_bn_after)
                if flags != (self._observing, self._bn_frozen):
                    self._observing, self._bn_frozen = flags
                    self.jstep = self._make_jstep()
            self.epoch_tt.tic()
            self.train_epoch(epoch)
            self.epoch_tt.toc()
            print('{:.3f}s per epoch'.format(self.epoch_tt.sum_reset() / 1e9))

            # multi-host: eval + checkpointing happen on the main process
            # only (params are replicated; other hosts proceed and block at
            # the next epoch's first global dispatch)
            if getattr(self, '_is_main', True):
                interval = max(int(getattr(self.config.eval, 'interval', 1)),
                               1)
                due = (epoch >= self._eval_after
                       and (epoch - self._eval_after) % interval == 0)
                if due or (epoch == self._max_epochs - 1
                           and epoch >= self._eval_after):
                    self.evaluate()
                self.save(epoch)

    def run(self):
        os.makedirs(self._weights_dir, exist_ok=True)
        if self._quant:
            print('quantization aware training')
            self._observing, self._bn_frozen = True, False
        self.init_all()
        try:
            self.train()
        finally:
            self.close()

    def run_prune(self, prune_weight: str):
        """Fine-tune preset after pruning (reference trainer.py:357-368)."""
        cfg = self.config.clone().defrost()
        cfg.model.cfg_path = self.config.prune.new_cfg
        cfg.train.learning_rate_init = self._init_lr * 0.2
        cfg.train.warmup_epochs = 0.0
        cfg.train.max_epochs = int(getattr(self.config.prune,
                                           'finetune_epochs', 20))
        cfg.weight.backbone = ''
        cfg.weight.resume = prune_weight
        cfg.weight.clear_history = True
        cfg.eval.after = 0
        cfg.sparse.switch = False
        cfg.freeze()
        self.__init__(cfg)
        self._weight_base_name = \
            f'pruned-{round(self.config.prune.ratio * 100)}-model'
        self.run()

    def run_nas(self, cfg_text: str) -> float:
        """Short-train a NAS candidate and return its AP
        (reference trainer.py:321-339)."""
        self._warmup_epochs = 0.5
        self.cfg_text = cfg_text
        self.config.defrost()
        self.config.train.warmup_epochs = 0.5
        self.config.freeze()
        self.init_all()
        try:
            for epoch in range(0, self._eval_after + 1):
                self.train_epoch(epoch)
                if epoch >= self._eval_after:
                    return self.evaluate().AP
            return 0.0
        finally:
            # NAS builds one Trainer per candidate: without this, each
            # candidate leaks the process loader's workers + shm slabs
            self.close()
