"""CV shadow-model pipeline entry point.

Covers the reference's cv runner scripts (cv/run_finetune.py, cv/run_unlearn.py,
cv/run_score.py, cv/pretrain.py, cv/finetune.py, cv/attack.py) as one staged
CLI:

  python -m multimodal_unlearning_tpu.cli.cv_run stage=all n_shadow=8 ...

Stages: prepare (splits) → finetune (n_shadow models) → unlearn (per method)
→ score (prototype accuracy per group) → attack (U-LIRA / U-MIA).
Artifacts are .npz/.json under work_dir; stages skip existing artifacts
(idempotency like run_exps.py:30,42).
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

import numpy as np

from multimodal_unlearning_tpu.config import main as config_main
from multimodal_unlearning_tpu.config.registry import config_dir
from multimodal_unlearning_tpu.cv import attack as atk, data, score as score_mod, train, unlearn as unlearn_mod
from multimodal_unlearning_tpu.models import resnet


def net_config(name: str) -> resnet.ResNetConfig:
    if name == "resnet18-small":
        return resnet.ResNetConfig(widths=(8, 8, 16, 16), small_inputs=True)
    return resnet.ResNetConfig()


def load_corpus(cfg):
    if cfg.data == "synthetic":
        ds = data.SyntheticFaces(
            n_persons=cfg.n_persons, images_per_person=cfg.images_per_person,
            image_size=cfg.image_size, seed=cfg.seed,
            noise=float(cfg.get("noise", 0.2)),
        )
        return data.preprocess(ds.images()), np.asarray(ds.labels), ds.n_persons
    import datasets as hfds

    rows = hfds.load_from_disk(str(cfg.data))
    names = sorted(set(r["name"] for r in rows))
    label_map = {n: i for i, n in enumerate(names)}
    labels = np.array([label_map[r["name"]] for r in rows])
    imgs = np.stack([np.asarray(r["image"].resize((cfg.image_size, cfg.image_size))) for r in rows])
    return data.preprocess(imgs), labels, len(names)


def run(cfg):
    work = Path(cfg.work_dir)
    work.mkdir(parents=True, exist_ok=True)
    net_cfg = net_config(cfg.net)
    images, labels, n_classes = load_corpus(cfg)
    stages = (
        ["prepare", "pretrain", "finetune", "unlearn", "score", "attack"]
        if cfg.stage == "all" else [cfg.stage]
    )

    # ---- prepare ---------------------------------------------------------
    splits_file = work / "splits.pickle"
    if "prepare" in stages or not splits_file.exists():
        base = data.person_splits(labels, forget_size=cfg.forget_size, seed=cfg.seed)
        shadows = data.shadow_splits(
            labels, base, forget_size=cfg.forget_size, n_splits=cfg.n_shadow, seed=cfg.seed
        )
        with open(splits_file, "wb") as f:
            pickle.dump({"base": base, "shadows": shadows}, f)
        print(f"prepared splits → {splits_file}")
    with open(splits_file, "rb") as f:
        sp = pickle.load(f)
    base, shadows = sp["base"], sp["shadows"]

    def ckpt_path(kind, i):
        return work / f"{kind}_{i:03d}.npz"

    pretrain_path = work / "pretrained.npz"

    def save_ckpt(path, params, head, bn):
        import jax

        flat = {}
        for name, tree in (("p", params), ("h", head), ("b", bn)):
            for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                key = name + "/" + "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
                flat[key] = np.asarray(leaf)
        np.savez(path, **flat)

    def load_ckpt(path, template):
        import jax

        z = np.load(path)
        out = []
        for name, tree in zip(("p", "h", "b"), template):
            leaves_kp, treedef = jax.tree_util.tree_flatten_with_path(tree)
            leaves = []
            for kp, _ in leaves_kp:
                key = name + "/" + "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
                leaves.append(z[key])
            out.append(jax.tree_util.tree_unflatten(treedef, leaves))
        return tuple(out)

    # ---- pretrain the backbone on the celebrity-style corpus ------------
    # (cv/pretrain.py: ResNet+AdMSoftmax on celebrity-1000, person-disjoint)
    if "pretrain" in stages and not pretrain_path.exists():
        celeb = data.SyntheticFaces(
            n_persons=cfg.get("n_persons_pretrain", 4 * cfg.n_persons),
            images_per_person=cfg.images_per_person,
            image_size=cfg.image_size, seed=cfg.seed + 1000,
        )
        cimgs = data.preprocess(celeb.images())
        p, h, bn, losses = train.train_classifier(
            net_cfg, cimgs, np.asarray(celeb.labels), celeb.n_persons,
            epochs=cfg.finetune.epochs, batch_size=cfg.finetune.batch_size,
            lr=float(cfg.finetune.lr), weight_decay=float(cfg.finetune.weight_decay),
            seed=cfg.seed,
        )
        save_ckpt(pretrain_path, p, h, bn)
        print(f"pretrained backbone on {celeb.n_persons} identities, loss {losses[-1]:.3f}", flush=True)

    def pretrained_init():
        """backbone+bn from pretrain, fresh AdMSoftmax head (cv/finetune.py)."""
        if not pretrain_path.exists():
            return None
        import jax as _jax

        celeb_classes = cfg.get("n_persons_pretrain", 4 * cfg.n_persons)
        tpl_p, tpl_bn = resnet.init_params(net_cfg, _jax.random.PRNGKey(0))
        tpl_h = resnet.adms_init(net_cfg.widths[-1], celeb_classes, _jax.random.PRNGKey(1))
        p, h, bn = load_ckpt(pretrain_path, (tpl_p, tpl_h, tpl_bn))
        fresh_head = resnet.adms_init(net_cfg.widths[-1], n_classes, _jax.random.PRNGKey(2))
        return (p, fresh_head, bn)

    use_fleet = bool(cfg.get("fleet", True))

    def fetch(tree):
        """One device→host transfer for the whole stacked tree (per-shadow
        slicing then happens in numpy — not 128×leaves round-trips)."""
        import jax

        return jax.device_get(tree)

    def unstack(tree, i):
        import jax

        return jax.tree.map(lambda x: np.asarray(x[i]), tree)

    # ---- finetune the shadow fleet --------------------------------------
    if "finetune" in stages:
        init = pretrained_init()
        missing = [i for i in range(len(shadows)) if not ckpt_path("finetuned", i).exists()]
        if use_fleet and missing:
            # all S shadows as ONE vmapped program (cv/fleet.py)
            from multimodal_unlearning_tpu.cv import fleet as fleet_mod

            sel = np.stack([np.asarray(shadows[i]["train"]) for i in range(len(shadows))])
            p, h, bn, losses = fleet_mod.train_classifier_fleet(
                net_cfg, images, labels, n_classes, sel,
                epochs=cfg.finetune.epochs, batch_size=cfg.finetune.batch_size,
                lr=float(cfg.finetune.lr), weight_decay=float(cfg.finetune.weight_decay),
                seed=cfg.seed, init=init,
            )
            p, h, bn = fetch((p, h, bn))
            for i in range(len(shadows)):
                save_ckpt(ckpt_path("finetuned", i), *unstack((p, h, bn), i))
            print(
                f"fleet-finetuned {len(shadows)} shadows, mean final loss "
                f"{losses[:, -1].mean():.3f}", flush=True,
            )
        else:
            for i in missing:
                sel = np.array(shadows[i]["train"])
                p, h, bn, losses = train.train_classifier(
                    net_cfg, images[sel], labels[sel], n_classes,
                    epochs=cfg.finetune.epochs, batch_size=cfg.finetune.batch_size,
                    lr=float(cfg.finetune.lr), weight_decay=float(cfg.finetune.weight_decay),
                    seed=cfg.seed + i, init=init,
                )
                save_ckpt(ckpt_path("finetuned", i), p, h, bn)
                print(f"finetuned shadow {i}/{len(shadows)} loss {losses[-1]:.3f}", flush=True)

    template = None

    def get_template():
        nonlocal template
        if template is None:
            p, bn = resnet.init_params(net_cfg, __import__("jax").random.PRNGKey(0))
            h = resnet.adms_init(net_cfg.widths[-1], n_classes, __import__("jax").random.PRNGKey(1))
            template = (p, h, bn)
        return template

    # ---- unlearn ---------------------------------------------------------
    methods = (
        list(unlearn_mod.METHODS) if cfg.unlearn.method == "all" else [cfg.unlearn.method]
    )
    if "unlearn" in stages:
        hyper = dict(
            forget_size=cfg.forget_size,
            epochs=cfg.unlearn.epochs, batch_size=cfg.unlearn.batch_size,
            lr=float(cfg.unlearn.lr), weight_decay=float(cfg.unlearn.weight_decay),
            beta=float(cfg.unlearn.beta), alpha=float(cfg.unlearn.alpha),
            rmu_c=float(cfg.unlearn.rmu_c), balance=int(cfg.unlearn.balance),
            num_classes=n_classes,
        )
        forget_ids = [i for i, s in enumerate(shadows) if s["with_forget"]]
        for method in methods:
            missing = [i for i in forget_ids if not (work / f"{method}_{i:03d}.npz").exists()]
            if use_fleet and missing:
                import jax as _jax

                from multimodal_unlearning_tpu.cv import fleet as fleet_mod

                ckpts = [load_ckpt(ckpt_path("finetuned", i), get_template()) for i in forget_ids]
                stacked = _jax.tree.map(lambda *xs: np.stack(xs), *ckpts)
                # note: fleet seed i is contiguous over the forget-trained
                # shadows (shadow k gets seed + rank(k)), matching the
                # sequential path when forget shadows are 0..n/2-1 (they are);
                # retrain restarts from each shadow's own ckpt (as sequential)
                p, h, bn = fleet_mod.unlearn_fleet(
                    method, net_cfg, stacked, stacked, images, labels, base,
                    seed=cfg.seed, pretrained_stacked=True, **hyper,
                )
                p, h, bn = fetch((p, h, bn))
                for r, i in enumerate(forget_ids):
                    save_ckpt(work / f"{method}_{i:03d}.npz", *unstack((p, h, bn), r))
                print(f"fleet-unlearned[{method}] {len(forget_ids)} shadows", flush=True)
            else:
                for i in missing:
                    ckpt = load_ckpt(ckpt_path("finetuned", i), get_template())
                    p, h, bn = unlearn_mod.unlearn(
                        method, net_cfg, ckpt, ckpt, images, labels, base,
                        seed=cfg.seed + i, **hyper,
                    )
                    save_ckpt(work / f"{method}_{i:03d}.npz", p, h, bn)
                    print(f"unlearned[{method}] shadow {i}", flush=True)

    groups = {
        "forget": base[f"forget_{cfg.forget_size:02d}"],
        "retain": base[f"retain_{100 - cfg.forget_size}"],
        "holdout": base[f"holdout_{cfg.forget_size:02d}"],
    }

    # ---- score -----------------------------------------------------------
    if "score" in stages:
        results = {}
        for kind in ["finetuned"] + methods:
            path = ckpt_path(kind, 0) if kind == "finetuned" else work / f"{kind}_000.npz"
            if not path.exists():
                continue
            p, h, bn = load_ckpt(path, get_template())
            emb = train.embed_all(net_cfg, p, bn, images)
            results[kind] = score_mod.score(emb, labels, groups, num_enroll=cfg.num_enroll)
        with open(work / "scores.json", "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(results, indent=2))

    # ---- attack ----------------------------------------------------------
    if "attack" in stages and len(shadows) < 4:
        print(f"attack skipped: needs >= 4 shadow models for the quarter bank layout, have {len(shadows)}")
        stages = [s for s in stages if s != "attack"]
    if "attack" in stages:
        report = {}
        for method in ["finetuned"] + methods:
            # in-models: unlearned if available else finetuned; out: finetuned
            paths = []
            ok = True
            for i in range(len(shadows)):
                path = work / f"{method}_{i:03d}.npz"
                if not path.exists():
                    path = ckpt_path("finetuned", i)
                if not path.exists():
                    ok = False
                    break
                paths.append(path)
            if not ok:
                continue
            if use_fleet:
                import jax as _jax

                from multimodal_unlearning_tpu.cv import fleet as fleet_mod

                ckpts = [load_ckpt(p, get_template()) for p in paths]
                sp_, sh_, sbn_ = _jax.tree.map(lambda *xs: np.stack(xs), *ckpts)
                embs = fleet_mod.embed_all_fleet(net_cfg, sp_, sbn_, images)  # [S,N,D]
                cols = [
                    atk.sample_logits(embs[i], labels, num_enroll=cfg.num_enroll).reshape(-1, 1)
                    for i in range(len(shadows))
                ]
            else:
                cols = []
                for path in paths:
                    p, h, bn = load_ckpt(path, get_template())
                    emb = train.embed_all(net_cfg, p, bn, images)
                    cols.append(atk.sample_logits(emb, labels, num_enroll=cfg.num_enroll).reshape(-1, 1))
            results = np.hstack(cols)
            entry = {}
            if cfg.attack in ("ulira", "both"):
                entry["ulira_acc"] = atk.ulira(results, groups["forget"], groups["holdout"])
            if cfg.attack in ("umia", "both"):
                entry["umia_acc"] = atk.umia(results, groups["forget"], groups["holdout"])
            report[method] = entry
        with open(work / "attack.json", "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report, indent=2))
    return True


main = config_main(config_dir() / "cv", "pipeline")(run)

if __name__ == "__main__":
    main()
