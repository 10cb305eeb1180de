from vtp_tpu.convert.from_torch import convert_state_dict, load_vtp_checkpoint

__all__ = ["convert_state_dict", "load_vtp_checkpoint"]
