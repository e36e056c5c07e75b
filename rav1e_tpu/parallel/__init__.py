from rav1e_tpu.parallel.mesh import make_mesh, sharded_frame_analysis, sharded_inter_analysis

__all__ = ["make_mesh", "sharded_frame_analysis"]
