"""Mechanical completeness audit (VERDICT r4 #8): enumerate the REFERENCE's
public surface from its files and assert each element has a LIVE counterpart
here — an importable symbol, a registry hit, or a same-named entry point —
not just a PARITY.md row. Exceptions are explicit and documented.

Enumerated surfaces:
  * experiment YAMLs (experiments/<script>/*.yaml)  -> same-path YAML here
  * model builder scripts (lib/config/<script>/)    -> build_model + get_default_config
  * per-model tracker files (lib/test/tracker/*.py) -> eval params + tracker dispatch
  * eval dataset registry (evaluation/datasets.py)  -> eval.datasets.dataset_dict
  * train dataset registry (base_functions.py)      -> train.builders.names2datasets
  * train dataset adapter classes (lib/train/dataset/__init__.py) -> class twins
  * train script dispatch (train_script_mixformer)  -> train.builders registry
  * CLI entry points (tracking/*.py + repo-root)    -> tracking/*.py here
  * shell drivers (*.sh)                            -> scripts/*.sh here
  * lib/utils modules                               -> mapped symbol imports
  * external/ components                            -> mapped module imports
"""
import ast
import importlib
import os
import re

import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not present")

SCRIPTS = sorted(d for d in os.listdir(os.path.join(REF, "lib", "config"))
                 if os.path.isdir(os.path.join(REF, "lib", "config", d)))


def test_reference_script_inventory_is_what_we_think():
    """The audit below keys on the 12 per-script config dirs; fail loudly if
    the reference tree ever differs from the surveyed inventory."""
    assert SCRIPTS == [
        "asymmetric_shared", "asymmetric_shared_ce", "asymmetric_shared_online",
        "mixformer_convmae", "mixformer_convmae_online",
        "mixformer_cvt", "mixformer_cvt_online",
        "mixformer_vit", "mixformer_vit_online",
        "mixformer_vit_rgbt", "mixformer_vit_rgbt_shared",
        "mixformer_vit_rgbt_unibackbone",
    ]


def test_every_experiment_yaml_exists_here():
    """Zero effective-config diff is covered by test_experiments_yaml; this
    asserts the FILE surface: every reference experiment YAML (and the two
    global tracking YAMLs) exists at the same relative path."""
    missing = []
    for root, _, files in os.walk(os.path.join(REF, "experiments")):
        for f in files:
            if not f.endswith(".yaml"):
                continue
            rel = os.path.relpath(os.path.join(root, f),
                                  os.path.join(REF, "experiments"))
            if not os.path.isfile(os.path.join(REPO, "experiments", rel)):
                missing.append(rel)
    assert not missing, f"experiment YAMLs without counterparts: {missing}"


def test_every_script_has_config_and_model_builder():
    """get_default_config + build_model must cover every reference script
    (the 12-way dispatch, lib/train/train_script_mixformer.py:77-102).
    Module construction is cheap (no tracing), so build for real."""
    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.models.build import build_model
    for script in SCRIPTS:
        cfg = get_default_config(script)
        model = build_model(script, cfg)
        assert model is not None, script


def test_every_reference_model_builder_function_is_mapped():
    """Every public build_* factory in lib/models maps to a live builder
    symbol here (grouped per family module, not 1:1 files — the parity map
    is in each module's docstring)."""
    builders = set()
    models_dir = os.path.join(REF, "lib", "models")
    for root, _, files in os.walk(models_dir):
        if "deformable_attention" in root:
            continue     # internal (position encoding); covered by fusion map
        for f in files:
            if f.endswith(".py"):
                src = open(os.path.join(root, f), encoding="utf-8").read()
                builders.update(re.findall(r"^def (build_\w+)", src, re.M))
    # internal helpers, not public model factories
    builders -= {"build_box_head", "build_position_encoding"}
    mapping = {
        "build_mixformer_cvt": "multi_modal_tracking_tpu.models.cvt:build_mixformer_cvt",
        "build_mixformer_cvt_online_score":
            "multi_modal_tracking_tpu.models.cvt:build_mixformer_cvt",   # with_score=True
        "build_mixformer_vit": "multi_modal_tracking_tpu.models.mixformer:build_mixformer_vit",
        "build_mixformer_vit_online_score":
            "multi_modal_tracking_tpu.models.mixformer:build_mixformer_vit",   # with_score=True
        "build_mixformer_convmae":
            "multi_modal_tracking_tpu.models.convmae:build_mixformer_convmae",
        "build_mixformer_convmae_online_score":
            "multi_modal_tracking_tpu.models.convmae:build_mixformer_convmae",   # with_score=True
        "build_mixformer_vit_rgbt":
            "multi_modal_tracking_tpu.models.vit_rgbt:build_vit_rgbt",
        "build_mixformer_vit_rgbt_shared":
            "multi_modal_tracking_tpu.models.vit_rgbt:build_vit_rgbt",   # variant="shared"
        "build_mixformer_vit_rgbt_uni":
            "multi_modal_tracking_tpu.models.vit_rgbt:build_vit_rgbt",   # variant="unibackbone"
        "build_asymmetric_shared":
            "multi_modal_tracking_tpu.models.asymmetric_shared:build_mixformer_rgbt",
        "build_asymmetric_shared_ce":
            "multi_modal_tracking_tpu.models.asymmetric_shared:build_mixformer_rgbt",
        "build_asymmetric_shared_online_score":
            "multi_modal_tracking_tpu.models.asymmetric_shared:build_mixformer_rgbt",
    }
    unmapped = builders - set(mapping)
    assert not unmapped, f"reference builders with no mapping: {sorted(unmapped)}"
    for ref_name, target in sorted(mapping.items()):
        mod, sym = target.split(":")
        assert hasattr(importlib.import_module(mod), sym), (ref_name, target)


def test_every_tracker_script_resolves_params_and_dispatch():
    """Each per-model tracker file (lib/test/tracker/<script>.py) needs a
    live eval path here: get_parameters(script, <any experiment yaml>) and a
    dispatch decision in eval.evaltracker.create_tracker."""
    from multi_modal_tracking_tpu.eval.evaltracker import is_rgbt_script
    from multi_modal_tracking_tpu.eval.params import get_parameters
    infra = {"__init__", "basetracker", "tracker_utils", "mulit_tracker_vis"}
    tracker_scripts = sorted(
        f[:-3] for f in os.listdir(os.path.join(REF, "lib", "test", "tracker"))
        if f.endswith(".py") and f[:-3] not in infra)
    assert tracker_scripts == SCRIPTS   # same 12 names
    for script in tracker_scripts:
        yamls = [f[:-5] for f in
                 os.listdir(os.path.join(REPO, "experiments", script))
                 if f.endswith(".yaml")]
        assert yamls, f"no experiment yaml for {script}"
        params = get_parameters(script, sorted(yamls)[0])
        assert params.cfg is not None
        # dispatch coverage: bimodal scripts take the RGBT loops, the rest
        # the unimodal RGB/TIR/Prompt loops (create_tracker)
        assert is_rgbt_script(script) == ("rgbt" in script
                                          or script.startswith("asymmetric"))


def test_eval_dataset_registry_superset():
    src = open(os.path.join(REF, "lib", "test", "evaluation", "datasets.py"),
               encoding="utf-8").read()
    ref_names = set(re.findall(r"^\s*(\w+)=DatasetInfo", src, re.M))
    assert len(ref_names) >= 19
    from multi_modal_tracking_tpu.eval.datasets import dataset_dict
    missing = ref_names - set(dataset_dict)
    assert not missing, f"eval datasets without counterparts: {sorted(missing)}"


def test_train_dataset_registry_superset():
    src = open(os.path.join(REF, "lib", "train", "base_functions.py"),
               encoding="utf-8").read()
    ref_names = set(re.findall(r'name == "([\w-]+)"', src))
    assert len(ref_names) >= 19
    from multi_modal_tracking_tpu.train.builders import names2datasets
    table_src = open(os.path.join(
        REPO, "multi_modal_tracking_tpu", "train", "builders.py"),
        encoding="utf-8").read()
    ours = set(re.findall(r'"([\w-]+)": lambda', table_src))
    missing = ref_names - ours
    assert not missing, f"train dataset names without counterparts: {sorted(missing)}"
    assert callable(names2datasets)


def test_train_dataset_adapter_classes_have_twins():
    """Every adapter class the reference exports from lib/train/dataset has a
    class twin here (module:class). lmdb twins included."""
    tree = ast.parse(open(os.path.join(REF, "lib", "train", "dataset",
                                       "__init__.py"), encoding="utf-8").read())
    ref_classes = [a.name for node in ast.walk(tree)
                   if isinstance(node, ast.ImportFrom) for a in node.names]
    D = "multi_modal_tracking_tpu.train.data.datasets"
    mapping = {
        "Lasot": D + ".unimodal:LaSOT",
        "Got10k": D + ".unimodal:GOT10k",
        "TrackingNet": D + ".unimodal:TrackingNet",
        "ImagenetVID": D + ".unimodal:ImagenetVID",
        "MSCOCO": D + ".unimodal:COCOSeq",   # image set served via the seq adapter
        "MSCOCOSeq": D + ".unimodal:COCOSeq",
        "TNL2k": D + ".unimodal:TNL2k",
        "Got10k_lmdb": D + ".lmdb_twins:GOT10kLmdb",
        "Lasot_lmdb": D + ".lmdb_twins:LaSOTLmdb",
        "ImagenetVID_lmdb": D + ".lmdb_twins:ImagenetVIDLmdb",
        "MSCOCOSeq_lmdb": D + ".lmdb_twins:COCOSeqLmdb",
        "TrackingNet_lmdb": D + ".lmdb_twins:TrackingNetLmdb",
        "VTUAV": D + ".rgbt:VTUAV",
        "LasHeR": D + ".rgbt:LasHeR",
        "RGBT234": D + ".rgbt:RGBT234",
        "KAIST": D + ".rgbt:KAIST",
        "LLVIPseq": D + ".rgbt:LLVIP",
        "M3FDseq": D + ".rgbt:M3FD",
        "DepthTrack": D + ".rgbt:DepthTrack",
        "RGBT234_T": D + ".rgbt:RGBT234_TIR",
        "LasHeR_T": D + ".rgbt:LasHeR_TIR",
        "VTUAV_Test": D + ".rgbt:VTUAV",   # split_dirs=('test_data',) variant
    }
    unmapped = set(ref_classes) - set(mapping)
    assert not unmapped, f"adapter classes with no mapping: {sorted(unmapped)}"
    for ref_name, target in sorted(mapping.items()):
        mod, sym = target.split(":")
        assert hasattr(importlib.import_module(mod), sym), (ref_name, target)


def test_train_script_dispatch_superset():
    """Every script name train_script_mixformer.py dispatches on has a
    builder here (train.builders.build_train_setup registry)."""
    src = open(os.path.join(REF, "lib", "train", "train_script_mixformer.py"),
               encoding="utf-8").read()
    ref_names = set(re.findall(r'script_name == "(\w+)"', src))
    for group in re.findall(r"script_name in \[([^\]]*)\]", src):
        ref_names.update(re.findall(r'"(\w+)"', group))
    # "mixformer_online_cvt" is reference dead code: no config dir, no
    # experiment yaml, unreachable from tracking/train.py (the dispatch at
    # :79 can never be fed that name). Documented exception.
    ref_names.discard("mixformer_online_cvt")
    assert ref_names == set(SCRIPTS)
    import multi_modal_tracking_tpu.train.builders as B
    from multi_modal_tracking_tpu.models.build import build_model
    from multi_modal_tracking_tpu.config import get_default_config
    for script in sorted(ref_names):
        assert build_model(script, get_default_config(script)) is not None
    assert callable(B.build_dataloaders)


# CLI twins. Exceptions, each deliberate:
#   _init_paths.py     — sys.path shim; a real package needs none.
CLI_EXCEPTIONS = {"_init_paths"}
# Repo-root scripts that live under tracking/ here (flat CLIs -> one dir).
ROOT_PY = {"fps", "gen_video", "gen_video_uavtir"}


def test_cli_entry_points_exist():
    ref_clis = sorted(
        f[:-3] for f in os.listdir(os.path.join(REF, "tracking"))
        if f.endswith(".py") and f[:-3] not in CLI_EXCEPTIONS)
    ours = {f[:-3] for f in os.listdir(os.path.join(REPO, "tracking"))
            if f.endswith(".py")}
    missing = [c for c in ref_clis if c not in ours]
    assert not missing, f"CLI entry points without counterparts: {missing}"
    for name in ROOT_PY:
        assert os.path.isfile(os.path.join(REF, f"{name}.py"))
        assert name in ours, f"root CLI {name}.py missing from tracking/"


# install_pytorch17.sh installs the reference's CUDA toolchain — meaningless
# on TPU (documented exception).
SH_EXCEPTIONS = {"install_pytorch17.sh"}


def test_shell_drivers_exist():
    ref_sh = set()
    for d in (REF, os.path.join(REF, "tracking")):
        ref_sh.update(f for f in os.listdir(d) if f.endswith(".sh"))
    ref_sh -= SH_EXCEPTIONS
    ours = set(os.listdir(os.path.join(REPO, "scripts")))
    missing = sorted(ref_sh - ours)
    assert not missing, f"shell drivers without counterparts: {missing}"


def test_lib_utils_modules_mapped():
    """Each lib/utils module maps to live symbols here (the pytree/optax
    redesigns are the counterparts, not file twins — see PARITY.md)."""
    mapping = {
        "box_ops.py": "multi_modal_tracking_tpu.ops.boxes:ciou_loss",
        "ce_utils.py": "multi_modal_tracking_tpu.train.train_step:adjust_keep_rate",
        "tensor.py": "multi_modal_tracking_tpu.train.data.loader:collate",   # pytree collate replaces TensorDict/TensorList
        "misc.py": "multi_modal_tracking_tpu.parallel.distributed:initialize_distributed",
        "lmdb_utils.py": "multi_modal_tracking_tpu.utils.lmdb_utils:decode_img",
        "lr_shed.py": "multi_modal_tracking_tpu.train.optimizer:make_optimizer",
        "classification_loss.py": "multi_modal_tracking_tpu.train.losses:lb_hinge",
        "merge.py": "multi_modal_tracking_tpu.models.asymmetric_shared:MixFormerRGBT",
        "heapmap_utils.py": "multi_modal_tracking_tpu.ops.boxes:box_xywh_to_xyxy",
    }
    ref_utils = sorted(f for f in os.listdir(os.path.join(REF, "lib", "utils"))
                       if f.endswith(".py") and f != "__init__.py")
    unmapped = set(ref_utils) - set(mapping)
    assert not unmapped, f"lib/utils modules with no mapping: {sorted(unmapped)}"
    for ref_name, target in sorted(mapping.items()):
        mod, sym = target.split(":")
        assert hasattr(importlib.import_module(mod), sym), (ref_name, target)


def test_external_components_mapped():
    mapping = {
        "AR": "multi_modal_tracking_tpu.models.alpha_refine:build_alpha_refine",
        "PreciseRoIPooling": "multi_modal_tracking_tpu.ops.prroi:prroi_pool",
        "vot20": None,    # workspace configs: file check below
    }
    ext = sorted(d for d in os.listdir(os.path.join(REF, "external"))
                 if os.path.isdir(os.path.join(REF, "external", d)))
    unmapped = set(ext) - set(mapping)
    assert not unmapped, f"external components with no mapping: {sorted(unmapped)}"
    for name, target in mapping.items():
        if target is None:
            continue
        mod, sym = target.split(":")
        assert hasattr(importlib.import_module(mod), sym), name
    assert os.path.isdir(os.path.join(REPO, "vot_workspace"))


def test_config_key_surface_per_script():
    """Every top-level + MODEL/TRAIN/DATA/TEST key in each reference config
    module's default tree must be accepted by our strict overlay (a missing
    key would make that reference YAML un-loadable here). Extracted by AST
    (no torch import): cfg.X.Y = ... assignments."""
    from multi_modal_tracking_tpu.config import get_default_config
    for script in SCRIPTS:
        path = os.path.join(REF, "lib", "config", script, "config.py")
        tree = ast.parse(open(path, encoding="utf-8").read())
        ref_keys = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign) and len(node.targets) == 1:
                t = node.targets[0]
                parts = []
                while isinstance(t, ast.Attribute):
                    parts.append(t.attr)
                    t = t.value
                if isinstance(t, ast.Name) and t.id == "cfg" and parts:
                    ref_keys.add(tuple(reversed(parts)))
        cfg = get_default_config(script)
        missing = []
        for key_path in sorted(ref_keys):
            node = cfg
            for k in key_path:
                if not hasattr(node, "get") or node.get(k, None) is None \
                        and k not in node:
                    missing.append(".".join(key_path))
                    break
                node = node.get(k)
        assert not missing, f"{script}: config keys missing: {missing}"
