"""Run the ACTUAL reference PyTorch code from /root/reference as a parity
oracle.

The reference imports four packages this environment lacks — ``timm``,
``torchvision``, ``mmcv``, ``easydict`` — plus the compiled
``MultiScaleDeformableAttention`` CUDA extension.  All five are tiny import
surfaces for the model files we need (verified by grepping every use site):

* ``timm.models.vision_transformer.VisionTransformer`` — only used as a base
  class whose ``__init__`` stores standard attributes and whose
  ``init_weights`` is called once (asymmetric_shared_ce.py:285,310,367); the
  subclass overwrites ``patch_embed``/``blocks`` and nulls
  ``cls_token``/``pos_embed``/``norm``/``head`` (:511-514).
* ``timm.models.layers.{DropPath, Mlp}`` — standard definitions
  (asymmetric_shared_ce.py:9,236,242).
* ``torchvision`` — ``lib.utils.box_ops`` needs ``ops.boxes.box_area``;
  ``lib.utils.misc`` only touches torchvision inside functions we never call
  (misc.py:311,469).
* ``mmcv.ops.{ModulatedDeformConv2d, ModulatedDeformConv2dPack}`` —
  fusion_utils.py:3; only DCN fusion variants instantiate them, and our DCN
  oracle (tests/test_deform_conv.py) covers that op separately, so the stub
  raises if actually constructed-and-run without weights.
* ``MultiScaleDeformableAttention`` (CUDA ext) — imported at module scope by
  ms_deform_attn_func.py:18; we stub the import and then rebind
  ``MSDeformAttnFunction`` to the reference's OWN pure-PyTorch parity core
  ``ms_deform_attn_core_pytorch`` (ms_deform_attn_func.py:41-61), which the
  reference ships precisely as the CUDA kernel's ground truth.

Everything else that executes is genuine reference code.
"""
from __future__ import annotations

import math
import sys
import types
from functools import partial

import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"

_installed = False


# --------------------------------------------------------------------- shims

def _mk_module(name):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


def _install_easydict():
    class EasyDict(dict):
        """Attribute-access dict matching easydict's behaviour as used by
        lib/config/*/config.py (attr set/get, recursive dict promotion)."""

        def __init__(self, d=None, **kwargs):
            super().__init__()
            if d:
                for k, v in dict(d).items():
                    setattr(self, k, v)
            for k, v in kwargs.items():
                setattr(self, k, v)

        def __setattr__(self, name, value):
            if isinstance(value, dict) and not isinstance(value, EasyDict):
                value = EasyDict(value)
            elif isinstance(value, (list, tuple)):
                value = type(value)(
                    EasyDict(x) if isinstance(x, dict) and not isinstance(x, EasyDict) else x
                    for x in value)
            object.__setattr__(self, name, value)
            dict.__setitem__(self, name, value)

        # real easydict routes item assignment through __setattr__ too —
        # lib/config/*/config.py _update_config relies on this (it merges
        # YAML overlays with ``base_cfg[k] = v``)
        __setitem__ = __setattr__

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError as e:
                raise AttributeError(name) from e

    mod = _mk_module("easydict")
    mod.EasyDict = EasyDict


def _install_timm():
    class DropPath(nn.Module):
        """timm stochastic depth (identity in eval; train scales by keep)."""

        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    class Mlp(nn.Module):
        """timm MLP: fc1 -> act -> drop -> fc2 -> drop."""

        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            return nn.init.trunc_normal_(tensor, mean, std, a, b)

    class _BasePatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True):
            super().__init__()
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()
            self.num_patches = (img_size // patch_size) ** 2
            self.flatten = flatten

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    class VisionTransformer(nn.Module):
        """Base-class surface the reference subclass relies on
        (asymmetric_shared_ce.py:310-326): standard attribute construction
        plus ``init_weights``/``pos_drop``.  All compute-path modules are
        rebuilt by the subclass, so only attribute names matter here."""

        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     num_classes=1000, embed_dim=768, depth=12, num_heads=12,
                     mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0,
                     attn_drop_rate=0.0, drop_path_rate=0.0, weight_init="",
                     embed_layer=None, norm_layer=None, act_layer=None,
                     **kwargs):
            super().__init__()
            norm_layer = norm_layer or partial(nn.LayerNorm, eps=1e-6)
            embed_layer = embed_layer or _BasePatchEmbed
            self.num_classes = num_classes
            self.num_features = self.embed_dim = embed_dim
            self.num_tokens = 1
            self.patch_embed = embed_layer(
                patch_size=patch_size, in_chans=in_chans, embed_dim=embed_dim)
            self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
            num_patches = (img_size // patch_size) ** 2
            self.pos_embed = nn.Parameter(
                torch.zeros(1, num_patches + self.num_tokens, embed_dim))
            self.pos_drop = nn.Dropout(p=drop_rate)
            self.blocks = nn.Sequential()
            self.norm = norm_layer(embed_dim)
            self.head = (nn.Linear(embed_dim, num_classes)
                         if num_classes > 0 else nn.Identity())

        def init_weights(self, mode=""):
            trunc_normal_(self.pos_embed, std=0.02)
            if self.cls_token is not None:
                trunc_normal_(self.cls_token, std=0.02)
            self.apply(self._init_vit_weights)

        @staticmethod
        def _init_vit_weights(m):
            if isinstance(m, nn.Linear):
                trunc_normal_(m.weight, std=0.02)
                if m.bias is not None:
                    nn.init.zeros_(m.bias)
            elif isinstance(m, nn.LayerNorm):
                nn.init.zeros_(m.bias)
                nn.init.ones_(m.weight)

    timm = _mk_module("timm")
    models = _mk_module("timm.models")
    vit_mod = _mk_module("timm.models.vision_transformer")
    layers = _mk_module("timm.models.layers")
    vit_mod.VisionTransformer = VisionTransformer
    layers.DropPath = DropPath
    layers.Mlp = Mlp
    layers.trunc_normal_ = trunc_normal_
    layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    models.vision_transformer = vit_mod
    models.layers = layers
    timm.models = models
    timm.__version__ = "0.5.4-shim"


def _install_torchvision():
    tv = _mk_module("torchvision")
    ops = _mk_module("torchvision.ops")
    boxes = _mk_module("torchvision.ops.boxes")
    misc = _mk_module("torchvision.ops.misc")

    def box_area(b):
        # torchvision.ops.boxes.box_area for xyxy boxes
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    boxes.box_area = box_area
    misc.interpolate = torch.nn.functional.interpolate
    ops.boxes = boxes
    ops.misc = misc
    tv.ops = ops
    tv.__version__ = "0.14.0-shim"
    tv._is_tracing = lambda: False


def _install_mmcv():
    class _Unavailable(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()
            raise RuntimeError(
                "mmcv ModulatedDeformConv2d stub constructed: the reference "
                "DCN fusion variants need real mmcv; use a non-DCN fusion "
                "class in reference-oracle tests")

    mmcv = _mk_module("mmcv")
    ops = _mk_module("mmcv.ops")
    ops.ModulatedDeformConv2d = _Unavailable
    ops.ModulatedDeformConv2dPack = _Unavailable
    mmcv.ops = ops
    mmcv.__version__ = "1.7.0-shim"


def _install_msda_ext():
    # Imported at module scope by ms_deform_attn_func.py:18; never called
    # because install() rebinds MSDeformAttnFunction (below).
    def _dead(*a, **k):  # pragma: no cover
        raise RuntimeError("CUDA MultiScaleDeformableAttention stub called")

    ext = _mk_module("MultiScaleDeformableAttention")
    ext.ms_deform_attn_forward = _dead
    ext.ms_deform_attn_backward = _dead


def _torch_prroi_pool2d(features, rois, pooled_height, pooled_width,
                        spatial_scale):
    """Exact Precise RoI Pooling in pure torch.

    The bilinear interpolant is a sum of per-pixel tent bases; its integral
    over a bin factorises per axis into tent-segment integrals with the
    closed form H(u) below.  features (B, C, H, W); rois (R, 5) rows
    [batch_idx, x1, y1, x2, y2] (pre-scale); output (R, C, ph, pw)."""
    import torch as _t

    B, C, H, W = features.shape
    ph, pw = int(pooled_height), int(pooled_width)

    def H_cdf(u):
        # integral of the unit tent from -inf to u (support [-1, 1])
        u = u.clamp(-1.0, 1.0)
        neg = (u + 1.0) ** 2 / 2.0
        pos = 1.0 - (1.0 - u) ** 2 / 2.0
        return _t.where(u <= 0, neg, pos)

    def axis_weights(lo, hi, n):
        # (bins,) lo/hi -> (bins, n) per-pixel tent integrals over [lo, hi]
        p = _t.arange(n, dtype=lo.dtype)[None, :]
        return H_cdf(hi[:, None] - p) - H_cdf(lo[:, None] - p)

    out = []
    for r in range(rois.shape[0]):
        b = int(rois[r, 0].item())
        x1, y1, x2, y2 = (rois[r, 1:] * spatial_scale).unbind()
        # CUDA kernel clamps the RoI extent to >= 0 and emits 0 for empty
        # bins (prroi_pooling_gpu_impl.cu:176-191)
        bw = (x2 - x1).clamp_min(0.0) / pw
        bh = (y2 - y1).clamp_min(0.0) / ph
        xs = x1 + bw * _t.arange(pw, dtype=rois.dtype)
        ys = y1 + bh * _t.arange(ph, dtype=rois.dtype)
        wx = axis_weights(xs, xs + bw, W)           # (pw, W)
        wy = axis_weights(ys, ys + bh, H)           # (ph, H)
        raw = _t.einsum("chw,ph,qw->cpq", features[b], wy, wx)
        area = bw * bh
        out.append(_t.where(area > 0, raw / area.clamp_min(1e-12),
                            _t.zeros_like(raw)))
    return _t.stack(out, dim=0)


# ------------------------------------------------------------------- install

def install():
    """Install shims, put /root/reference on sys.path, and rebind the CUDA
    MSDeformAttnFunction to the reference's own pure-torch core.  Idempotent."""
    global _installed
    if _installed:
        return
    sys.dont_write_bytecode = True  # never write __pycache__ into /root/reference
    # The reference moves buffers to CUDA unconditionally at construction time
    # (lib/models/mixformer_cvt/head.py:50,143); torch here is CPU-only, so
    # make .cuda() a no-op for the oracle process.
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    # lib/test/tracker/*.py __init__ also asks for the current CUDA device and
    # maps checkpoint storages onto it (asymmetric_shared_ce.py:17-19)
    torch.cuda.current_device = lambda: 0
    torch.UntypedStorage.cuda = lambda self, *a, **k: self
    torch.TypedStorage.cuda = lambda self, *a, **k: self
    # torch._six was removed in torch 2.x; lib/train/data/loader.py:5 still
    # imports string_classes from it
    six_mod = _mk_module("torch._six")
    six_mod.string_classes = (str, bytes)
    six_mod.int_classes = (int,)
    torch._six = six_mod
    # lib/train/data/image_loader.py:1 imports jpeg4py (libjpeg-turbo binding)
    # at module scope; its loaders fall back to cv2 on any failure, so a
    # raising stub keeps genuine behaviour
    jpeg_mod = _mk_module("jpeg4py")

    class _JPEG:
        def __init__(self, *a, **k):
            raise RuntimeError("jpeg4py unavailable in oracle environment")

    jpeg_mod.JPEG = _JPEG
    # lib/utils/lmdb_utils.py:1 imports lmdb at module scope (pulled in by
    # the lib.test.evaluation package __init__ via tracker.py:8); the handle
    # cache only calls lmdb.open lazily, so a raising stub keeps non-lmdb
    # paths genuine
    lmdb_mod = _mk_module("lmdb")

    def _no_lmdb(*a, **k):
        raise RuntimeError("lmdb unavailable in oracle environment")

    lmdb_mod.open = _no_lmdb
    # lib/train/dataset/coco.py:8 imports pycocotools at module scope (pulled
    # in transitively by tracker_rgbt.py:18 -> lib.train.dataset.__init__);
    # only the COCO dataset adapter instantiates it
    coco_pkg = _mk_module("pycocotools")
    coco_mod = _mk_module("pycocotools.coco")

    class _NoCOCO:
        def __init__(self, *a, **k):
            raise RuntimeError("pycocotools unavailable in oracle environment")

    coco_mod.COCO = _NoCOCO
    coco_pkg.coco = coco_mod
    mask_mod = _mk_module("pycocotools.mask")
    mask_mod.decode = _NoCOCO
    mask_mod.frPyObjects = _NoCOCO
    coco_pkg.mask = mask_mod
    _install_easydict()
    _install_timm()
    _install_torchvision()
    _install_mmcv()
    _install_msda_ext()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import importlib
    func_mod = importlib.import_module(
        "lib.models.mixformer_vit_rgbt.deformable_attention.ops.functions.ms_deform_attn_func")
    funcs_pkg = importlib.import_module(
        "lib.models.mixformer_vit_rgbt.deformable_attention.ops.functions")
    core = func_mod.ms_deform_attn_core_pytorch

    class _PurePyTorchMSDeformAttnFunction:
        """Differentiable stand-in whose .apply matches the CUDA Function's
        signature (ms_deform_attn_func.py:23) but runs the reference's own
        grid_sample parity core (:41-61)."""

        @staticmethod
        def apply(value, value_spatial_shapes, value_level_start_index,
                  sampling_locations, attention_weights, im2col_step):
            return core(value, value_spatial_shapes, sampling_locations,
                        attention_weights)

    # The SPM score decoders pool with PrRoIPool2D
    # (lib/models/mixformer_cvt/score_decoder.py:9), whose Function
    # JIT-compiles a CUDA extension at first call
    # (external/PreciseRoIPooling/pytorch/prroi_pool/functional.py:21-38).
    # Rebind it to an exact closed-form torch integral of the bilinear
    # interpolant — the op's mathematical definition; prroi numerics are
    # independently pinned by tests/test_prroi.py's avg-pool gold (the
    # acceptance test the PrRoIPooling repo itself ships).
    try:
        import importlib as _il
        _pp = _il.import_module(
            "external.PreciseRoIPooling.pytorch.prroi_pool.prroi_pool")
        _pp.prroi_pool2d = _torch_prroi_pool2d
        _il.import_module(
            "external.PreciseRoIPooling.pytorch.prroi_pool.functional"
        ).prroi_pool2d = _torch_prroi_pool2d
    except Exception:
        pass

    # Importing ...ops.functions above already ran the whole
    # lib.models.mixformer_vit_rgbt package __init__ chain (it imports
    # mixformer -> fusion_utils -> deformable_encoder -> ops.modules), so the
    # modules bound the ORIGINAL CUDA Function into their globals.  Rebind it
    # everywhere it landed.
    for name, mod in list(sys.modules.items()):
        if mod is not None and hasattr(mod, "MSDeformAttnFunction"):
            mod.MSDeformAttnFunction = _PurePyTorchMSDeformAttnFunction
    _installed = True


def _install_tikzplotlib():
    # lib/test/analysis/plot_results.py:1 imports tikzplotlib at module scope
    # but only calls tikzplotlib.save inside plot_draw_save; a no-op shim
    # keeps the genuine print_results/extract_results paths importable.
    mod = _mk_module("tikzplotlib")
    mod.save = lambda *a, **k: None


def install_eval_env(lasher_path="", results_path="", result_plot_path="",
                     save_dir="", prj_dir=REFERENCE_ROOT, **extra):
    """Inject ``lib.test.evaluation.local`` so the genuine env_settings()
    resolves (lib/test/evaluation/environment.py:115-126 would otherwise try
    to WRITE a default local.py into /root/reference).  Re-entrant: each call
    rebinds the paths (module-scoped fixtures pass their own tmp dirs)."""
    install()
    _install_tikzplotlib()
    import importlib
    env_mod = importlib.import_module("lib.test.evaluation.environment")
    mod = _mk_module("lib.test.evaluation.local")
    paths = dict(lasher_path=lasher_path, results_path=results_path,
                 result_plot_path=result_plot_path, save_dir=save_dir,
                 prj_dir=prj_dir, **extra)

    def local_env_settings():
        settings = env_mod.EnvSettings()
        for k, v in paths.items():
            setattr(settings, k, v)
        return settings

    mod.local_env_settings = local_env_settings
    # make the package attribute consistent for `from lib.test.evaluation
    # import local` style access
    if "lib.test.evaluation" in sys.modules:
        sys.modules["lib.test.evaluation"].local = mod
    return local_env_settings()


def load_flagship_module():
    """Import and return the genuine reference flagship module."""
    install()
    import importlib
    return importlib.import_module(
        "lib.models.mixformer_vit_rgbt.asymmetric_shared_ce")


def load_reference_config(script: str, yaml_name: str | None = None):
    """Build the reference's own cfg via its config module (+ optional
    experiment YAML overlay), exactly as lib/test/evaluation does."""
    install()
    import importlib
    cfg_mod = importlib.import_module(f"lib.config.{script}.config")
    import copy
    cfg = copy.deepcopy(cfg_mod.cfg)
    if yaml_name is not None:
        path = f"{REFERENCE_ROOT}/experiments/{script}/{yaml_name}.yaml"
        cfg_mod.update_config_from_file(path)
        cfg = copy.deepcopy(cfg_mod.cfg)
    return cfg
