"""Results-table builders (reference: mm/build_vllm_table.py, mm/build_mod_table.py).

Two modes:
- ``mode=vllm``: per-method metric computation (in-process — no subprocess
  fan-out needed, unlike build_vllm_table.py:26-29) → grouped hmean columns
  (Real/Retain/Forget metric, Model utility), Forget Quality = 1 − JS,
  LaTeX with the papergray low-retain marker (build_vllm_table.py:95-113);
- ``mode=mod``: same per modality {text, visual, both}
  (build_mod_table.py:16-23,59-71).

Usage:
  python -m multimodal_unlearning_tpu.cli.build_tables mode=vllm \
      base_model=models/llava/ft_full+tofu gold_model=models/llava/ft_retain90+tofu \
      'methods=[npo, grad_ascent]' out=mm_results
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pandas as pd
from scipy.stats import hmean

from multimodal_unlearning_tpu.evaluation import metrics

REAL_METRICS = ["Prob. Real Faces", "Truth Ratio Real Faces", "Prob. Real World", "Truth Ratio Real World"]
RETAIN_METRICS = ["Prob. Retain", "Truth Ratio Retain", "Prob. Retain FaceRec", "Truth Ratio Retain FaceRec"]
FORGET_METRICS = ["Prob. Forget", "Truth Ratio Forget", "Prob. Forget FaceRec", "Truth Ratio Forget FaceRec"]
UTIL_METRICS = REAL_METRICS + RETAIN_METRICS

MODALITY_SUFFIXES = {"_text": "text", "_visual": "visual", "": "both"}


def aggregate_one(model_dir: Path, gold_aggregated: dict, method_name: str, res_folder: Path, reeval=False) -> dict:
    """calculate_metrics for one run dir with artifact caching
    (run_aggregate_res analog, build_vllm_table.py:14-29)."""
    res_file = res_folder / (model_dir.name + ".json")
    if res_file.exists() and not reeval:
        return json.loads(res_file.read_text())
    eval_results = model_dir / "eval_results" / "eval_log_aggregated.json"
    if not eval_results.exists():
        raise FileNotFoundError(f"File {eval_results} not found")
    ckpt = json.loads(eval_results.read_text())
    res = dict(
        method=method_name,
        **metrics.compute_model_utility(ckpt),
        **metrics.evaluate_forget_quality(ckpt, gold_aggregated),
    )
    res_folder.mkdir(parents=True, exist_ok=True)
    res_file.write_text(json.dumps(res, indent=4, default=float))
    return res


def build_table(rows: list[dict], out_json: Path) -> pd.DataFrame:
    df = pd.DataFrame(rows)

    def calc(keys):
        present = [k for k in keys if k in df.columns]
        return hmean([df[k] for k in present], axis=0)

    df["Real metric"] = calc(REAL_METRICS)
    df["Forget metric"] = calc(FORGET_METRICS)
    df["Retain metric"] = calc(RETAIN_METRICS)
    df["Model utility"] = calc(UTIL_METRICS)
    df["Forget Quality"] = 1 - df["JS metric"]
    df.to_json(out_json, indent=4)

    # papergray marker for collapsed-retain rows (build_vllm_table.py:108-110)
    gray = df["Retain metric"] < 0.4
    df.loc[gray, "Method"] = df.loc[gray, "Method"].apply(lambda x: "\\rowcolor{papergray} " + x)
    cols = ["Method", "Real metric", "Retain metric", "Forget metric", "Forget Quality"]
    if "Modality" in df.columns:
        cols.insert(1, "Modality")
    print(df[cols].to_latex(header=True, index=False, float_format="%.2f"))
    return df


def main(argv=None):
    args = dict(
        a.split("=", 1) for a in (sys.argv[1:] if argv is None else argv) if "=" in a
    )
    mode = args.get("mode", "vllm")
    base = Path(args["base_model"])
    gold = Path(args["gold_model"])
    res_folder = Path(args.get("out", "mm_results"))
    methods = [m.strip() for m in args.get("methods", "").strip("[]").split(",") if m.strip()]

    gold_aggregated = json.loads(
        (gold / "eval_results" / "eval_log_aggregated.json").read_text()
    )
    rows = []
    for name, run_dir in [("Gold", gold), ("Base", base)]:
        try:
            rows.append({**aggregate_one(run_dir, gold_aggregated, name, res_folder), "Method": name})
        except FileNotFoundError as e:
            print(f"skip {name}: {e}")

    suffixes = MODALITY_SUFFIXES if mode == "mod" else {"": None}
    for m in methods:
        for suffix, modality in suffixes.items():
            run_dir = next(iter(sorted(base.glob(f"{m}*{suffix}"))), None) if suffix or mode == "vllm" else None
            run_dir = run_dir or (base / f"{m}_sweep")
            try:
                row = {**aggregate_one(run_dir, gold_aggregated, m, res_folder), "Method": m}
                if modality:
                    row["Modality"] = modality
                rows.append(row)
            except FileNotFoundError as e:
                print(f"skip {m}{suffix}: {e}")

    if not rows:
        print("no results found")
        return None
    return build_table(rows, res_folder / ("modalities_results.json" if mode == "mod" else "mm_results.json"))


if __name__ == "__main__":
    main()
