"""Hub publisher (reference: push_model.py:1-10): upload a trained
checkpoint dir to the HF hub.  Requires egress + credentials; on zero-egress
pods it validates the layout and reports what would be pushed."""

from __future__ import annotations

import sys
from pathlib import Path


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv)
    if len(args) < 2:
        print("usage: push_model <checkpoint_dir> <repo_id>")
        sys.exit(2)
    ckpt_dir, repo_id = Path(args[0]), args[1]
    files = sorted(p.name for p in ckpt_dir.glob("*") if p.is_file())
    if "model.safetensors" not in files:
        print(f"{ckpt_dir} is not an HF-layout checkpoint (no model.safetensors)")
        sys.exit(1)
    try:
        from huggingface_hub import HfApi

        api = HfApi()
        api.create_repo(repo_id, exist_ok=True)
        api.upload_folder(folder_path=str(ckpt_dir), repo_id=repo_id)
        print(f"Pushed {ckpt_dir} → {repo_id}")
    except Exception as e:  # zero-egress / no credentials
        print(f"Would push {files} from {ckpt_dir} to {repo_id}; hub unavailable: {e}")


if __name__ == "__main__":
    main()
