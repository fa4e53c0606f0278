"""Cross-cutting utilities: config, checkpointing, logging, visualization.

(Exports are complete, unlike the reference's utils/__init__.py:28-44 which
forgot ``load_all_configs`` and broke its CLIs; SURVEY.md §7.1.)
"""

from .config import (  # noqa: F401
    get_config_value,
    load_all_configs,
    load_config,
    merge_configs,
    print_config,
    save_config,
    set_config_value,
    validate_config,
)
from .checkpoint import (  # noqa: F401
    checkpoint_info,
    export_stablehlo,
    load_checkpoint,
    load_model_weights,
    save_checkpoint,
    save_model_weights,
)
from .logging import MetricsLogger, Stopwatch  # noqa: F401
from .runtime import (  # noqa: F401
    enable_compilation_cache,
    jit_init,
    set_prng_impl,
)
