/* rav1e_tpu C API — counterpart of the reference's crav1e header
 * (reference src/capi.rs:396-1339, cbindgen surface).
 *
 * Link against librav1e_tpu_capi.so (built from native/capi.cc) and
 * libpython3.12; set PYTHONPATH to the rav1e_tpu package root.
 */
#ifndef RAV1E_TPU_H
#define RAV1E_TPU_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct RaConfig RaConfig;
typedef struct RaContext RaContext;
typedef struct RaFrame RaFrame;

typedef struct RaPacket {
  const uint8_t *data;
  size_t len;
  uint64_t input_frameno;
  int frame_type; /* 0 = KEY, 1 = INTER */
} RaPacket;

typedef enum RaEncoderStatus {
  RA_ENCODER_STATUS_SUCCESS = 0,
  RA_ENCODER_STATUS_NEED_MORE_DATA = 1,
  RA_ENCODER_STATUS_ENOUGH_DATA = 2,
  RA_ENCODER_STATUS_LIMIT_REACHED = 3,
  RA_ENCODER_STATUS_FAILURE = -1,
} RaEncoderStatus;

/* Configuration */
RaConfig *rav1e_config_default(void);
int rav1e_config_parse(RaConfig *cfg, const char *key, const char *value);
int rav1e_config_parse_int(RaConfig *cfg, const char *key, int value);
void rav1e_config_unref(RaConfig *cfg);

/* Context */
RaContext *rav1e_context_new(const RaConfig *cfg);
void rav1e_context_unref(RaContext *ctx);

/* Frames */
RaFrame *rav1e_frame_new(RaContext *ctx);
int rav1e_frame_fill_plane(RaFrame *frame, int plane, const uint8_t *data,
                           size_t len, ptrdiff_t stride, int bytewidth);
void rav1e_frame_unref(RaFrame *frame);

/* Encode loop: send NULL frame to flush. */
int rav1e_send_frame(RaContext *ctx, RaFrame *frame);
int rav1e_receive_packet(RaContext *ctx, RaPacket **packet);
void rav1e_packet_unref(RaPacket *packet);

const char *rav1e_version_short(void);

#ifdef __cplusplus
}
#endif

#endif /* RAV1E_TPU_H */
