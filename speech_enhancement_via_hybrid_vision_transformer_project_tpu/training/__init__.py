"""Training layer: losses, optimizers/schedules, SPMD Trainer."""

from .losses import (  # noqa: F401
    LossConfig,
    combined_loss,
    create_loss_function,
    multi_resolution_stft_loss,
    perceptual_loss,
    spectrogram_loss,
    stoi_proxy_loss,
)
from .optimizer import (  # noqa: F401
    EpochScheduler,
    chain_with_clip,
    create_optimizer,
    create_scheduler,
    warmup_cosine_step_schedule,
)
from .trainer import (  # noqa: F401
    TrainState,
    Trainer,
    get_learning_rate,
    make_step_fns,
    set_learning_rate,
)
