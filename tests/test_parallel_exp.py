"""Grid fan-out tests (reference: label_anything/experiment/run.py:851-891
``ParallelRun``): per-run YAML rendering round-trips through the grid
expander, and the bounded-concurrency local backend actually executes jobs.
"""

import sys

import yaml

from labelanything_tpu.experiment.parallel import (LocalProcessBackend,
                                                   ParallelExperimenter,
                                                   listify_leaves)
from labelanything_tpu.utils.config import expand_experiment

GRID = {
    "experiment": {"name": ["t"], "group": ["g"], "continue_with_errors": [True]},
    "model": {"name": ["lam_no_vit"], "embed_dim": [64, 128]},
    "train_params": {"max_epochs": [1], "seed": [42],
                     "possible_batch_example_nums": [[[2, 1, 2]]]},
}


class StubBackend(LocalProcessBackend):
    """Replaces the real training command with a trivial echo process, so
    the pool/launch mechanics are tested without compiling a model."""

    def command(self, param_file, out_dir, index):
        return [sys.executable, "-c",
                f"print('job', {index}, {str(param_file)!r})"]


def test_render_round_trips_grid(tmp_path):
    exp = ParallelExperimenter(GRID, out_dir=str(tmp_path),
                               backend=StubBackend())
    jobs = exp.render()
    assert len(jobs) == 2  # embed_dim grid axis
    rendered = []
    for job in jobs:
        with open(job["param_file"]) as f:
            cfg = yaml.safe_load(f)
        flat = expand_experiment(cfg)
        assert len(flat) == 1  # re-listified 1-point grid
        rendered.append(flat[0])
    assert {r["model"]["embed_dim"] for r in rendered} == {64, 128}
    # non-grid leaves survive the round trip, including nested lists
    assert all(r["train_params"]["possible_batch_example_nums"] == [[2, 1, 2]]
               for r in rendered)
    assert (tmp_path / "jobs" / "commands.sh").exists()


def test_listify_leaves_inverts_expansion():
    flat = expand_experiment(GRID)[0]
    again = expand_experiment({"parameters": listify_leaves(flat)})
    assert again == [flat]


def test_launch_runs_jobs_bounded(tmp_path):
    exp = ParallelExperimenter(GRID, out_dir=str(tmp_path),
                               backend=StubBackend(), max_parallel=1)
    results = exp.launch()
    assert [j["returncode"] for j in results] == [0, 0]
    for j in results:
        assert f"job {j['index']}" in j["out_file"].read_text()


def test_only_create_does_not_execute(tmp_path):
    exp = ParallelExperimenter(GRID, out_dir=str(tmp_path),
                               backend=StubBackend())
    jobs = exp.launch(only_create=True)
    assert all("returncode" not in j for j in jobs)
    assert all(not j["out_file"].exists() for j in jobs)
