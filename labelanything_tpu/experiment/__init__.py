from .run import Run
from .experiment import Experimenter, experiment, run as run_single
from .parallel import ParallelExperimenter

__all__ = ["Run", "Experimenter", "experiment", "run_single",
           "ParallelExperimenter"]
