from ldm3d_tpu.utils.config_merge import merge_configs_onto_args, TrainContext

__all__ = ["merge_configs_onto_args", "TrainContext"]
