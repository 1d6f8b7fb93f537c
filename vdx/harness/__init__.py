from vdx.harness.config import (
    CFG_VALUES,
    DEFAULT_CFG,
    DEFAULT_STEPS,
    STEPS_VALUES,
    TEST_VIDEOS,
    ExperimentConfig,
)
from vdx.harness.grid import (
    generate_manifest,
    generate_video,
    measure_experiments,
    plan_grid_search,
    run_grid_search,
    save_experiment,
)

__all__ = [
    "CFG_VALUES",
    "DEFAULT_CFG",
    "DEFAULT_STEPS",
    "STEPS_VALUES",
    "TEST_VIDEOS",
    "ExperimentConfig",
    "generate_manifest",
    "generate_video",
    "measure_experiments",
    "plan_grid_search",
    "run_grid_search",
    "save_experiment",
]
