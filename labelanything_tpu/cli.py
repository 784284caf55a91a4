"""Command-line interface (reference: label_anything/cli.py:12-371).

Verbs: experiment, run, validate, test, generate_embeddings, generate_gt,
benchmark, rename_coco20i_json, app.
"""

from __future__ import annotations

import json

import click


@click.group()
def main():
    """labelanything-tpu: TPU-native multi-class few-shot segmentation."""


@main.command("experiment")
@click.option("--parameters", required=True, type=click.Path(exists=True))
@click.option("--out-dir", default="runs")
@click.option("--parallel", is_flag=True,
              help="fan the grid out as parallel jobs instead of running "
                   "sequentially (reference: ParallelRun sbatch fan-out)")
@click.option("--only-create", is_flag=True,
              help="with --parallel: render per-run YAMLs + commands.sh "
                   "without launching")
@click.option("--max-parallel", default=2, type=int)
@click.option("--backend", default="local",
              type=click.Choice(["local", "tpu-pod"]))
@click.option("--tpu-names", default=None,
              help="tpu-pod backend: comma-separated TPU VM names")
@click.option("--zone", default="us-central2-b")
def experiment_cmd(parameters, out_dir, parallel, only_create, max_parallel,
                   backend, tpu_names, zone):
    """Run a grid of training runs from a YAML parameter file."""
    if parallel:
        from .experiment.parallel import (LocalProcessBackend,
                                          ParallelExperimenter, TpuPodBackend)
        from .utils.config import load_yaml

        if backend == "tpu-pod":
            be = TpuPodBackend((tpu_names or "").split(","), zone=zone)
        else:
            be = LocalProcessBackend()
        exp = ParallelExperimenter(load_yaml(parameters), out_dir=out_dir,
                                   backend=be, max_parallel=max_parallel)
        for job in exp.launch(only_create=only_create):
            click.echo(f"run{job['index']}: "
                       f"{job.get('returncode', 'created')}")
        return
    from .experiment import experiment

    experiment(parameters, out_dir=out_dir)


@main.command("run")
@click.option("--parameters", required=True, type=click.Path(exists=True))
@click.option("--out-dir", default="runs/single")
def run_cmd(parameters, out_dir):
    """Run a single training run (first grid point of the YAML)."""
    from .experiment import run_single

    run_single(parameters, out_dir=out_dir)


@main.command("validate")
@click.option("--parameters", required=True, type=click.Path(exists=True))
@click.option("--out-dir", default="runs/validate")
@click.option("--checkpoint", default=None,
              help="Checkpoint to evaluate: a save_pretrained/HF-snapshot "
                   "dir, a run checkpoints dir (latest/best), or a torch "
                   "weights file. Runs the FULL fold x rerun protocol of the "
                   "YAML (one grid per fold) and emits the mIoU/FB-IoU table.")
@click.option("--folds", default=None,
              help="comma-separated grid/fold indexes (default: all)")
@click.option("--reruns", default=None, type=int,
              help="override val_params.reruns")
@click.option("--compare", default=None, type=click.Path(exists=True),
              help="JSON of reference numbers to diff against (paper table)")
def validate_cmd(parameters, out_dir, checkpoint, folds, reruns, compare):
    """Validate a checkpointed run on its validation datasets."""
    if checkpoint is not None:
        from .experiment.evaluate import evaluate_checkpoint

        fold_list = ([int(x) for x in folds.split(",")]
                     if folds else None)
        results = evaluate_checkpoint(parameters, checkpoint,
                                      out_dir=out_dir, folds=fold_list,
                                      reruns=reruns, compare=compare)
        click.echo(json.dumps(results, indent=2))
        return
    from .experiment import Run
    from .utils.config import expand_experiment, load_yaml

    config = load_yaml(parameters)
    flat = expand_experiment(config)[0]
    run = Run().init(flat, run_dir=out_dir)
    # lazy-init params from the first val batch, then restore + validate
    loader = next(iter(run.val_loaders.values()))
    (batch, gts), _ = next(iter(loader))
    device_batch, _ = run._device_batch(batch)
    from .train.substitutor import Substitutor

    sub = Substitutor(substitute=False)
    sub.reset(device_batch)
    input_dict, gt = next(sub)
    run._lazy_init(input_dict, gt)
    metrics = run.validate(epoch=0)
    click.echo(metrics)


@main.command("test")
@click.option("--parameters", required=True, type=click.Path(exists=True))
@click.option("--out-dir", default="runs/test")
def test_cmd(parameters, out_dir):
    """Cross-domain test protocol (support prompts -> cached class embeddings
    -> per-image predict)."""
    from .experiment import Run
    from .utils.config import expand_experiment, load_yaml

    config = load_yaml(parameters)
    flat = expand_experiment(config)[0]
    run = Run().init(flat, run_dir=out_dir)
    click.echo(run.test())


@main.command("generate_embeddings")
@click.option("--encoder", default="vit_b", help="encoder registry name")
@click.option("--checkpoint", default=None, type=click.Path())
@click.option("--use_sam_checkpoint", is_flag=True)
@click.option("--directory", required=True, type=click.Path(exists=True))
@click.option("--instances_path", default=None, type=click.Path())
@click.option("--batch_size", default=8)
@click.option("--num_workers", default=16)
@click.option("--outfolder", default="data/processed/embeddings")
@click.option("--last_block_dir", default=None)
@click.option("--image_size", default=1024)
@click.option("--custom_preprocess/--square_resize", default=True)
@click.option("--limit", default=None, type=int)
def generate_embeddings_cmd(**kwargs):
    """Extract image-encoder embeddings to safetensors caches."""
    from .preprocess import preprocess_images_to_embeddings

    preprocess_images_to_embeddings(encoder_name=kwargs.pop("encoder"), **kwargs)


@main.command("generate_embeddings_huggingface")
@click.option("--model_name", required=True,
              help="local HF checkpoint dir (config.json + weights)")
@click.option("--directory", required=True, type=click.Path(exists=True))
@click.option("--instances_path", default=None)
@click.option("--batch_size", default=8)
@click.option("--outfolder", default="data/processed/embeddings")
@click.option("--image_resolution", default=480)
@click.option("--custom_preprocess/--square_resize", default=True)
@click.option("--limit", default=None, type=int)
def generate_embeddings_hf_cmd(**kwargs):
    from .preprocess import preprocess_images_to_embeddings_huggingface

    preprocess_images_to_embeddings_huggingface(**kwargs)


@main.command("generate_feature_pyramids")
@click.option("--encoder", required=True, help="local backbone checkpoint dir")
@click.option("--directory", required=True, type=click.Path(exists=True))
@click.option("--instances_path", default=None)
@click.option("--batch_size", default=4)
@click.option("--outfolder", default="data/processed/pyramids")
@click.option("--image_resolution", default=384)
@click.option("--limit", default=None, type=int)
def generate_feature_pyramids_cmd(encoder, **kwargs):
    from .preprocess import preprocess_images_to_feature_pyramids

    preprocess_images_to_feature_pyramids(encoder_name=encoder, **kwargs)


@main.command("preprocess_clip")
@click.option("--clip_model_path", required=True)
@click.option("--directory", required=True, type=click.Path(exists=True))
@click.option("--instances_path", default=None)
@click.option("--outfolder", default="data/processed/clip")
@click.option("--limit", default=None, type=int)
def preprocess_clip_cmd(**kwargs):
    from .preprocess import preprocess_clip

    preprocess_clip(**kwargs)


@main.command("preprocess_voc")
@click.option("--input_folder", required=True, type=click.Path(exists=True))
def preprocess_voc_cmd(input_folder):
    from .preprocess import preprocess_voc

    preprocess_voc(input_folder)


@main.command("pretrain_pe")
@click.option("--parameters", required=True, type=click.Path(exists=True))
def pretrain_pe_cmd(parameters):
    """CLIP-contrastive prompt-encoder pretraining."""
    from .utils.config import expand_experiment, load_yaml

    config = expand_experiment(load_yaml(parameters))[0]
    from .data.loader import EpisodeLoader  # noqa: F401 (doc pointer)
    from .data.prompt_encoder_dataset import PromptEncoderDataset, collate_fn
    from .models.contrastive_pe import ContrastivePromptEncoder
    from .models.registry import model_registry
    from .train.pretraining import pretrain_prompt_encoder
    import jax.numpy as jnp
    import jax

    model_cfg = dict(config["model"])
    pe_cfg = dict(model_cfg.pop("prompt_encoder"))
    lam = model_registry[pe_cfg.pop("name")](**pe_cfg)
    model = ContrastivePromptEncoder(prompt_encoder=lam.prompt_encoder,
                                     **model_cfg)
    train_ds = PromptEncoderDataset(**config["dataset"]["train"])
    val_ds = PromptEncoderDataset(**config["dataset"]["val"])

    def batches(ds):
        def gen():
            n = len(ds)
            step = config.get("classes_per_batch", min(4, n))
            for start in range(0, n, step):
                items = [ds[i] for i in range(start, min(start + step, n))]
                yield jax.tree.map(jnp.asarray, collate_fn(items))
        return gen

    params = pretrain_prompt_encoder(
        model, batches(train_ds), batches(val_ds),
        **config.get("train_loop", {}))
    from .train.checkpoint import save_params

    out = config.get("out_dir", "runs/pretrain_pe/params")
    save_params(out, params)
    click.echo(f"saved pretrained prompt encoder params to {out}")


@main.command("generate_gt")
@click.option("--dataset_name", required=True)
@click.option("--anns_path", required=True, type=click.Path(exists=True))
@click.option("--outfolder", required=True, type=click.Path(exists=True))
def generate_gt_cmd(dataset_name, anns_path, outfolder):
    from .preprocess import generate_ground_truths

    generate_ground_truths(dataset_name, anns_path, outfolder)


@main.command("rename_coco20i_json")
@click.option("--instances_path", required=True, type=click.Path(exists=True))
def rename_coco20i_json_cmd(instances_path):
    from .preprocess import rename_coco20i_json

    rename_coco20i_json(instances_path)


@main.command("benchmark")
@click.option("--mode", default="decode",
              type=click.Choice(["decode", "vit", "train", "pipeline"]))
@click.option("--batch", default=None, type=int)
@click.option("--steps", default=None, type=int)
@click.option("--reps", default=3, type=int)
def benchmark_cmd(mode, batch, steps, reps):
    """Model throughput benchmark (episodes/sec or images/sec).

    Reference's ``benchmark`` verb times a toy MLP (reference:
    cli.py:287-327); this one runs the production paths in
    labelanything_tpu.benchmarks."""
    import json as _json

    from .benchmarks import (bench_decode, bench_pipeline, bench_train,
                             bench_vit)

    kw = {} if mode == "pipeline" else {"reps": reps}
    if batch:
        kw["batch_size"] = batch
    if steps:
        kw["steps"] = steps
    fns = {"vit": bench_vit, "decode": bench_decode, "train": bench_train,
           "pipeline": bench_pipeline}
    result = fns[mode](**kw)
    print(_json.dumps(result))


@main.command("app")
def app_cmd():
    """Launch the interactive demo app."""
    from .demo.app import launch

    launch()


if __name__ == "__main__":
    main()
