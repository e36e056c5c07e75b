from rav1e_tpu.decoder.decode import decode_packet

__all__ = ["decode_packet"]
