"""Typed, frozen configuration tree (self-contained yacs replacement).

Keeps the reference's two-config contract: this experiment config (yaml +
CLI dotlist overrides, reference config.py:30-149) names a separate
darknet-style architecture cfg via ``model.cfg_path`` — or a zoo model name.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List

import yaml


class ConfigNode:
    """Nested attribute dict with type-checked merging and freezing."""

    def __init__(self, data: Dict[str, Any] = None):
        object.__setattr__(self, '_frozen', False)
        object.__setattr__(self, '_data', {})
        for k, v in (data or {}).items():
            self._data[k] = ConfigNode(v) if isinstance(v, dict) else v

    # -- attribute access
    def __getattr__(self, name):
        data = object.__getattribute__(self, '_data')
        if name in data:
            return data[name]
        raise AttributeError(f'config has no key {name!r}')

    def __setattr__(self, name, value):
        if self._frozen:
            raise AttributeError(f'config is frozen; cannot set {name!r}')
        self._data[name] = value

    def __getitem__(self, name):
        return self._data[name]

    def __contains__(self, name):
        return name in self._data

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    # -- lifecycle
    def clone(self) -> 'ConfigNode':
        return copy.deepcopy(self)

    def freeze(self):
        object.__setattr__(self, '_frozen', True)
        for v in self._data.values():
            if isinstance(v, ConfigNode):
                v.freeze()
        return self

    def defrost(self):
        object.__setattr__(self, '_frozen', False)
        for v in self._data.values():
            if isinstance(v, ConfigNode):
                v.defrost()
        return self

    # -- merging
    def _coerce(self, key, old, new):
        if old is None or new is None:
            return new
        if isinstance(old, bool):
            if isinstance(new, bool):
                return new
            if isinstance(new, str):
                low = new.lower()
                if low in ('true', 'on', 'yes', '1'):
                    return True
                if low in ('false', 'off', 'no', '0'):
                    return False
            if isinstance(new, int):
                return bool(new)
            raise TypeError(f'{key}: cannot interpret {new!r} as bool')
        if isinstance(old, float) and isinstance(new, int):
            return float(new)
        if isinstance(old, (int, float)) and isinstance(new, str):
            try:
                return type(old)(float(new) if '.' in new or 'e' in new.lower() else new)
            except ValueError:
                raise TypeError(f'{key}: cannot interpret {new!r} as {type(old).__name__}')
        if isinstance(old, (list, tuple)) and isinstance(new, (list, tuple)):
            return list(new)
        if isinstance(old, str) and isinstance(new, bool):
            # tri-state string knobs ('auto'/'on'/'off'): yaml parses bare
            # on/off as bool before the merge sees it
            return 'on' if new else 'off'
        if type(old) is not type(new) and not (
                isinstance(old, (int, float)) and isinstance(new, (int, float))):
            raise TypeError(
                f'{key}: type mismatch ({type(new).__name__} vs {type(old).__name__})')
        return new

    def merge_dict(self, other: Dict[str, Any], _prefix=''):
        for k, v in other.items():
            full = f'{_prefix}{k}'
            if k not in self._data:
                raise KeyError(f'unknown config key: {full}')
            cur = self._data[k]
            if isinstance(cur, ConfigNode):
                if not isinstance(v, dict):
                    raise TypeError(f'{full}: expected a mapping')
                cur.merge_dict(v, _prefix=full + '.')
            else:
                self._data[k] = self._coerce(full, cur, v)
        return self

    def merge_from_file(self, path: str):
        with open(path, 'r') as fr:
            data = yaml.safe_load(fr) or {}
        return self.merge_dict(data)

    def merge_from_list(self, opts: List[str]):
        """Merge a flat [key, value, key, value, ...] CLI override list with
        dotted keys (reference trainer.py:381 cfg.merge_from_list)."""
        if len(opts) % 2 != 0:
            raise ValueError('override list must have even length')
        for key, value in zip(opts[::2], opts[1::2]):
            node = self
            parts = key.split('.')
            for p in parts[:-1]:
                if not isinstance(node, ConfigNode) or p not in node._data:
                    raise KeyError(f'unknown config key: {key}')
                node = node._data[p]
            leaf = parts[-1]
            if leaf not in node._data:
                raise KeyError(f'unknown config key: {key}')
            cur = node._data[leaf]
            if isinstance(value, str):
                try:
                    value = yaml.safe_load(value)
                except yaml.YAMLError:
                    pass
            node._data[leaf] = node._coerce(key, cur, value)
        return self

    def to_dict(self) -> Dict[str, Any]:
        return {k: v.to_dict() if isinstance(v, ConfigNode) else v
                for k, v in self._data.items()}

    def __repr__(self):
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


VOC_CLASSES = ['aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus',
               'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
               'motorbike', 'person', 'pottedplant', 'sheep', 'sofa',
               'train', 'tvmonitor']

# schema parity with the reference config tree (config.py:30-149), plus a
# TPU-specific `system` group replacing GPU ids with mesh controls.
DEFAULTS: Dict[str, Any] = {
    'system': {
        # force a JAX platform ('cpu' for rehearsals/CI on hosts whose
        # site file pins the TPU tunnel — the JAX_PLATFORMS env var is
        # overridden there). '' = the environment default.
        'platform': '',
        'num_workers': 4,          # host-side data pipeline workers
        # 'thread' (cv2/numpy release the GIL) or 'process' (spawned
        # worker pool + shared-memory slabs; scales past the GIL on
        # multi-core hosts — pure-Python augment control flow and label
        # assignment otherwise serialize on one core)
        'loader': 'thread',
        'data_devices': 0,         # 0 = all local devices in the data mesh
        # bf16 conv compute (f32 accumulate/BN/loss): ~1.8x faster training
        # on TPU with matching loss curves; set 'float32' for bitwise parity
        'compute_dtype': 'bfloat16',
        'prefetch': 2,             # host batch prefetch depth (loader queue)
        # uploaded-batch prefetch: a background thread device_puts the next
        # N groups so the host->device transfer overlaps the current step's
        # compute. Default OFF: uploads measure ~13 ms/batch on the axon
        # tunnel (not the round-3 bottleneck — that was the per-scalar
        # metric fetches, see _flush_metrics) and a put-thread concurrent
        # with main-thread dispatch wedged the tunnel client mid-epoch
        # (thread-stack dump in the round-4 notes).
        'device_prefetch': 0,
        # 'device': batches carry only padded GT boxes and the label grids
        # are built inside the jitted step (ops/labels.py) — ~4x fewer
        # host->device bytes and the loader sheds its hottest non-decode
        # cost. 'host': reference-style grids built in the loader
        # (data/train_data.py assign_labels); bit-identical semantics.
        'label_assign': 'device',
        # epoch-plan seed: deterministic sample/size plan, shared by every
        # host in a multi-host run (each host loads its slice of the plan)
        'seed': 0,
    },
    'experiment_name': 'VOC',
    'dataset': {
        'name': 'VOC',
        'train_txt_file': '',
        'eval_txt_file': '',
        'classes': VOC_CLASSES,
        # keep decoded images in RAM (copies handed to the augment chain):
        # trades ~0.8 MB/image for the ~6 ms JPEG decode per sample
        'cache_images': False,
        # device-resident dataset cache (single-host, augment.device +
        # label_assign=device only): ALL train images are decoded +
        # letterboxed at max(train.input_sizes) ONCE and uploaded to HBM
        # in chunks; each step then ships only sample indices and the
        # batch is gathered (and bilinear-resized for smaller multi-scale
        # sizes) on device. Turns the per-step host->device transfer
        # (~12.6 MB/batch — the wall-clock bound on thin links; the axon
        # tunnel measures 15-100 MB/s) into a one-off. Budget ~0.75 MB
        # HBM per 512^2 image (5.5 GB for 7k images).
        'device_cache': False,
    },
    'model': {
        'cfg_path': 'mobilenetv2-fpn',   # path to a .cfg or a zoo model name
        'strides': [8, 16, 32],
        'gt_per_grid': 3,
        'anchors': [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                    [59, 119], [116, 90], [156, 198], [373, 326]],
        'anchors_iou_threshold': 0.3,
        'max_gt_boxes': 64,        # static pad length for per-scale GT lists
    },
    'train': {
        'input_sizes': [320, 352, 384, 416, 448, 480, 512, 544, 576, 608],
        'batch_size': 12,
        'scheduler': 'cosine',
        'learning_rate_init': 2e-4,
        'learning_rate_end': 1e-6,
        'weight_decay': 0.0,
        # global-norm gradient clipping (0 = off, the reference's
        # behavior). Opt-in stabiliser for exploratory runs — NAS
        # candidates with deep heads can diverge at lr 4e-4 in the first
        # warmup steps; the reference's answer is catch-and-skip
        # (nas/search.py:70-83), this knob is the alternative
        'grad_clip': 0.0,
        # per-step max|activation| at each yolo head input ('head_max'
        # metric): names which head overflowed first when a NaN fires
        # (three tiny max-reduces; see train/step.py probe_heads)
        'head_probe': True,
        # space-to-depth stem ingest in the train step (see eval.s2d_stem;
        # trace-time weight fold, gradients flow to the original kernel)
        's2d_stem': 0,
        'mile_stones': [30, 45],
        'gamma': 0.1,
        'warmup_epochs': 1.0,
        'max_epochs': 80,
        # train steps fused into one device dispatch via lax.scan (>1
        # amortises per-dispatch marshalling; multi-scale sizes are then
        # drawn per group of unroll_steps batches instead of per batch)
        'unroll_steps': 1,
        # spatial partitioning: shard the image HEIGHT axis over this many
        # mesh positions (0/1 = off). The mesh becomes
        # (data x spatial) and XLA inserts conv halo exchanges — the
        # model-parallel axis for very large inputs (see
        # parallel/mesh.py make_mesh_2d). Needs the default
        # system.label_assign=device batch format; excludes unroll_steps>1.
        'spatial': 0,
        # activation rematerialisation (jax.checkpoint) for the backward
        # pass: N >= 2 runs the graph walk as N checkpointed segments
        # (only boundary activations stored; ~1 extra forward of FLOPs).
        # 0 disables; 1 wraps the whole forward (measured on v5e: REDUCES
        # max batch, avoid). Measured gains depend on the net: shallow
        # wide CNNs are bounded by single-layer temporaries, deep stacks
        # by stored activations (see STATUS.md).
        'remat': 0,
    },
    'augment': {
        'mixup_p': 0.5,
        'color_p': 0.0,
        'hflip_p': 0.5,
        'vflip_p': 0.0,
        'crop_p': 0.75,
        # 4-image mosaic before mixup (the reference implements Mosaic but
        # leaves it commented out of the chains, dataset/voc_sample.py:69-74)
        'mosaic_p': 0.0,
        # run the stochastic chain ON DEVICE inside the jitted train step
        # (ops/augment_device.py): the host does one cached-decode +
        # letterbox per sample — no mosaic x4 / mixup x2 host work. Needs
        # system.label_assign=device (the default). VOC/COCO getters only.
        'device': False,
        # device-chain mosaic/mixup partners gathered as FRESH uniform
        # corpus rows (host-parity independent draws) instead of in-batch
        # permutations that recycle the step's own augmented instances
        # (epoch-5 A/B matrix, reports/augab5_epoch5.json: in-batch
        # partners erase mosaic/mixup's +36 AP50 early-training boost).
        # 'auto' = on whenever dataset.device_cache provides the corpus;
        # 'on' requires the cache; 'off' keeps in-batch permutations.
        'fresh_partners': 'auto',
    },
    'weight': {
        'dir': 'weights',
        'backbone': '',
        'resume': '',
        'clear_history': False,
    },
    'eval': {
        'after': 30,
        # evaluate every Nth epoch once past eval.after (the final epoch
        # always evaluates). 1 = reference parity (trainer.py:311-316
        # evals every epoch); >1 amortises eval cost over long runs.
        'interval': 1,
        'input_size': 512,
        'batch_size': 16,
        'score_threshold': 0.1,
        'iou_threshold': 0.45,
        'map_iou': 0.5,
        'partial': 0,
        'max_detections': 256,     # static NMS output size
        # NMS candidate pool = max_detections * pool_factor top-scored
        # (box, class) pairs; NMSResult.overflow fires (and the evaluator
        # logs) if more pairs clear score_threshold than the pool holds
        'pool_factor': 4,
        'nms_method': 'nms',       # 'nms' | 'soft-nms' (tools.py:507-538)
        # serve the inverted-residual chains through the fused Pallas
        # kernel (ops/pallas_fused.py) instead of the XLA layer walk
        'fused_ir': False,
        # space-to-depth stem ingest factor (0 = off, 2 = fold the
        # stride-2 stem onto an (H/2, W/2, 12) tensor; function-
        # preserving — ops/space_to_depth.py)
        's2d_stem': 0,
        'nms_sigma': 0.3,          # gaussian decay for soft-nms
        # False (default): eval batches ship uint8 and normalize ON DEVICE
        # (4x fewer upload bytes). True: reference-style host-side float
        # Normalize — cli/diffeval pins this for bit-level parity with the
        # torch reference's own preprocessing.
        'host_normalize': False,
    },
    'sparse': {
        'switch': False,
        'ratio': 0.01,
    },
    'prune': {
        'weight': '',
        'new_cfg': '',
        'ratio': 0.3,
        # fine-tune length after pruning; 20 matches the reference's
        # hardcoded run_prune preset (trainer.py:357-368)
        'finetune_epochs': 20,
    },
    'quant': {
        'switch': False,
        'backend': 'int8',
        'disable_observer_after': 4,
        'freeze_bn_after': 8,
    },
}


def default_config() -> ConfigNode:
    return ConfigNode(copy.deepcopy(DEFAULTS))


def size_fix(size):
    """int -> (size, size); pairs pass through (reference config.py:7-13)."""
    if isinstance(size, int):
        return (size, size)
    return tuple(size)


def sizes_fix(sizes):
    return [size_fix(s) for s in sizes]


def load_config(yaml_path: str = None, opts: List[str] = None,
                freeze: bool = True) -> ConfigNode:
    cfg = default_config()
    if yaml_path:
        cfg.merge_from_file(yaml_path)
    if opts:
        cfg.merge_from_list(list(opts))
    if freeze:
        cfg.freeze()
    if cfg.system.platform:
        # must run before any JAX backend init; config.update is the only
        # channel that beats the site file's JAX_PLATFORMS override
        import jax
        jax.config.update('jax_platforms', cfg.system.platform)
    return cfg


def resolve_model_cfg(cfg: ConfigNode) -> str:
    """Resolve model.cfg_path into cfg text: a file path or a zoo name."""
    from pqdet_tpu.zoo import MODEL_ZOO, get_cfg
    path = cfg.model.cfg_path
    if path in MODEL_ZOO:
        return get_cfg(path, num_classes=len(cfg.dataset.classes))
    with open(path, 'r') as fr:
        return fr.read()
