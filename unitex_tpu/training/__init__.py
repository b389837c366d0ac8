from .flux_lora import (
    FluxLoraTrainConfig,
    TrainState,
    create_train_state,
    flow_match_loss,
    train_step,
)
