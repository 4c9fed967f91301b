"""Driver-visible end-to-end eval rehearsal on the real chip (VERDICT r2 #9).

Reproduces the reference's train.sh -> test.sh -> analysis flow
(tracking/train.py -> tracking/test.py -> eval.analysis) entirely on-device
against the in-memory synthetic RGBT set:

  1. smoke-train the flagship script (2 epochs, synthetic_smoke recipe)
     producing a loadable checkpoint;
  2. run the full eval runner (tracking/test.py main: params -> tracker ->
     per-sequence scan -> result writers) with that checkpoint;
  3. score the produced result files with the analysis stack (extract ->
     AUC / Precision / NormPrec) exactly as tracking/analysis_results.py;
  4. write artifacts/eval_rehearsal_r3.json.

Run: env PYTHONPATH=/root/repo:/root/.axon_site \
    python artifacts/eval_rehearsal.py
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(config="synthetic_smoke", epochs=None, out_name="eval_rehearsal_r3.json",
         dataset_name="synthetic_rgbt"):
    work = tempfile.mkdtemp(prefix="eval_rehearsal_")
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")

    print(f"[1/3] training flagship ({config}, epochs={epochs})", flush=True)
    cmd = [sys.executable, os.path.join(REPO, "tracking/train.py"),
           "--script", "asymmetric_shared_ce", "--config", config,
           "--save_dir", os.path.join(work, "train")]
    if epochs:
        cmd += ["--epochs", str(epochs)]
    subprocess.run(cmd, check=True, env=env)
    import glob
    ckpts = sorted(glob.glob(os.path.join(work, "train", "checkpoints",
                                          "**", "*.msgpack"), recursive=True))
    assert ckpts, f"no checkpoint produced under {work}/train/checkpoints"
    ckpt = ckpts[-1]
    print(f"    checkpoint: {ckpt}", flush=True)

    print(f"[2/3] running eval runner on {dataset_name}", flush=True)
    res_dir = os.path.join(work, "results")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tracking/test.py"),
         "asymmetric_shared_ce", config,
         "--dataset_name", dataset_name,
         "--checkpoint", ckpt, "--results_dir", res_dir, "--chunk", "16"],
        check=True, env=env)

    print("[3/3] scoring with the analysis stack", flush=True)
    from multi_modal_tracking_tpu.eval.analysis import (TrackerResults,
                                                        compute_scores,
                                                        extract_results)
    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    dataset = get_dataset(dataset_name)
    sub = os.path.join(res_dir, dataset_name)
    trackers = [TrackerResults(sub if os.path.isdir(sub) else res_dir,
                               display_name="flagship_smoke")]
    eval_data = extract_results(trackers, dataset, "rehearsal")
    m = compute_scores(eval_data)
    out = {
        "n_sequences": len(dataset),
        "auc": round(float(m["AUC"][0]), 2),
        "op50": round(float(m["OP50"][0]), 2),
        "op75": round(float(m["OP75"][0]), 2),
        "precision": round(float(m["Precision"][0]), 2),
        "norm_precision": round(float(m["Norm Precision"][0]), 2),
        "checkpoint": os.path.basename(ckpt),
        "dataset": dataset_name,
        "flow": f"train.py({config}, epochs={epochs}) -> test.py({dataset_name})"
                " -> analysis",
    }
    path = os.path.join(REPO, "artifacts", out_name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="synthetic_smoke")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--out", default="eval_rehearsal_r3.json")
    ap.add_argument("--dataset", default="synthetic_rgbt")
    a = ap.parse_args()
    main(a.config, a.epochs, a.out, a.dataset)
