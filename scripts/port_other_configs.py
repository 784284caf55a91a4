"""One-shot port of the reference's trainval/other/ config family
(reference: /root/reference/parameters/trainval/other/**) into this repo's
schema. Reads each live grid YAML, applies the same key translations the
hand-ported families used, and writes parameters/trainval/other/**.

Translations (matching the existing trainval/ ports):
- cluster-specific logger keys (tmp_dir, wandb entity/dirs,
  experiment_save_delta) are dropped; log frequencies kept
- train_params.seed -> parameters.seed; train_params.compile dropped
  (everything is jitted here)
- train_params.validation_reruns -> val_params.reruns (the key Run and the
  reference's current Run actually read, reference run.py:618-641)
- model.prototype_merge + few_type: Affinity -> few_type: PrototypeAffinity
  (build_lam derives the merge flag from few_type, build_lam.py)
- leonardo scratch paths -> canonical local data/ paths
- dataloader.prefetch_factor dropped (the EpisodeLoader prefetches by
  worker count)

The wandb-dump files (test_*.yaml, `wandb_version: 1`) are logging
artifacts, not grid sources; the clean equivalents live in parameters/test/.
"""
import pathlib
import re

import yaml

REF = pathlib.Path("/root/reference/parameters/trainval/other")
OUT = pathlib.Path(__file__).resolve().parents[1] / "parameters/trainval/other"


def map_path(p: str) -> str:
    """leonardo cluster path -> canonical local data/ path."""
    if not isinstance(p, str) or p.startswith("data/"):
        return p
    base = p.rstrip("/").split("/")[-1]
    low = p.lower()
    root = "data/pascal" if ("pascal" in low or "voc" in low or
                             "sbd" in low) else "data/coco"
    if "annotations" in low or base.endswith(".json"):
        return f"{root}/annotations/{base}"
    if "embedding" in low or "state" in low or "pyramid" in low:
        # keep the informative leaf (e.g. last_block_state under
        # vit_b_sam_embeddings) as a flat directory name
        parts = [s for s in p.split("/") if s]
        for i, s in enumerate(parts):
            if "embedding" in s or "pyramid" in s:
                return f"{root}/" + "_".join(parts[i:])
        return f"{root}/{base}"
    return f"{root}/{base}"


def walk_paths(node):
    if isinstance(node, dict):
        return {k: (
            [map_path(v) for v in val] if k in (
                "instances_path", "emb_dir", "img_dir", "gt_dir",
                "pyramids_dir", "root") and isinstance(val, list)
            else walk_paths(val))
            for k, val in node.items()}
    if isinstance(node, list):
        return [walk_paths(v) for v in node]
    return node


def transform(cfg: dict) -> dict:
    params = cfg.get("parameters") or {}
    tp = dict(params.get("train_params") or {})
    out_params = {}

    seed = tp.pop("seed", [42])
    tp.pop("compile", None)
    reruns = tp.pop("validation_reruns", None)

    logger = dict(params.get("logger") or {})
    logger = {k: logger[k] for k in (
        "log_frequency", "train_image_log_frequency",
        "val_image_log_frequency") if k in logger}

    model = dict(params.get("model") or {})
    if model.pop("prototype_merge", [False]) in ([True], True):
        if model.get("few_type") in (["Affinity"], "Affinity"):
            model["few_type"] = ["PrototypeAffinity"]

    dataloader = dict(params.get("dataloader") or {})
    dataloader.pop("prefetch_factor", None)

    out_params["seed"] = seed
    if logger:
        out_params["logger"] = logger
    out_params["train_params"] = tp
    if reruns is not None:
        out_params["val_params"] = {"reruns": reruns}
    out_params["model"] = model
    out_params["dataset"] = walk_paths(params.get("dataset") or {})
    out_params["dataloader"] = dataloader

    out = {"experiment": cfg.get("experiment") or {},
           "parameters": out_params}
    if cfg.get("other_grids"):
        out["other_grids"] = walk_paths(cfg["other_grids"])
    return out


def main():
    ported, skipped = [], []
    for src in sorted(REF.rglob("*.yaml")):
        rel = src.relative_to(REF)
        if "old" in rel.parts:
            continue
        cfg = yaml.safe_load(src.read_text())
        if not isinstance(cfg, dict) or "wandb_version" in cfg:
            skipped.append(str(rel))
            continue
        dst = OUT / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        header = (
            f"# Ported from the reference grid config\n"
            f"# (reference: parameters/trainval/other/{rel}); cluster paths\n"
            f"# mapped to local data/ and keys translated per\n"
            f"# scripts/port_other_configs.py.\n")
        dst.write_text(header + yaml.safe_dump(
            transform(cfg), sort_keys=False, default_flow_style=None))
        ported.append(str(rel))
    print(f"ported {len(ported)}: {ported}")
    print(f"skipped (wandb dumps): {skipped}")


if __name__ == "__main__":
    main()
