from vtp_tpu.utils.params import cast_matmul_params, fuse_ffn_params, param_count, tree_bytes

__all__ = ["cast_matmul_params", "fuse_ffn_params", "param_count", "tree_bytes"]
