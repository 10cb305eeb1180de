from vtp_tpu.generation.vtp_tokenizer import VTPTokenizer, VTP_Tokenizer
from vtp_tpu.generation.latents import (
    compute_latent_stats,
    load_latent_shards,
    save_latent_shard,
)

__all__ = [
    "VTPTokenizer",
    "VTP_Tokenizer",
    "compute_latent_stats",
    "load_latent_shards",
    "save_latent_shard",
]
