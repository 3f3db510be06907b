from asr_craft_tpu.utils.logging import MetricsLogger
