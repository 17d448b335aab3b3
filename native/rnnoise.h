/* RNNoise-compatible C API for the nnnoiseless_tpu native engine.
 *
 * ABI-compatible with the reference's generated header (cbindgen over
 * src/capi.rs): a C program written against the reference library links and
 * runs against libnnt_denoise unchanged.  Extensions beyond the reference
 * surface are prefixed nnt_.
 */

#ifndef NNT_RNNOISE_H
#define NNT_RNNOISE_H

#include <stddef.h>
#include <stdio.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct DenoiseState DenoiseState;
typedef struct RNNModel RNNModel;

/* Number of samples processed per call (480 = 10 ms at 48 kHz). */
int rnnoise_get_frame_size(void);

/* Size in bytes of a DenoiseState block, for caller-managed allocation. */
size_t rnnoise_get_size(void);

/* Initialize caller-allocated storage of rnnoise_get_size() bytes.
 * model may be NULL for the built-in weights; if non-NULL it must outlive
 * the state.  Returns 0 on success. */
int rnnoise_init(DenoiseState *st, RNNModel *model);

/* Allocate + initialize a state (model semantics as rnnoise_init). */
DenoiseState *rnnoise_create(RNNModel *model);

void rnnoise_destroy(DenoiseState *st);

/* Denoise one frame of 480 f32 samples in the i16 value range.
 * Returns the voice-activity probability.  in/out may alias. */
float rnnoise_process_frame(DenoiseState *st, float *out, const float *in);

/* Parse a binary .rnn model from an open file.  NULL on malformed input. */
RNNModel *rnnoise_model_from_file(FILE *f);

void rnnoise_model_free(RNNModel *model);

/* ---- nnt extensions ---------------------------------------------------- */

void rnnoise_reset(DenoiseState *st);

/* Batch FFI entry: process n_frames contiguous frames; vad_out (len
 * n_frames) may be NULL. */
void nnt_process_frames(DenoiseState *st, float *out, const float *in,
                        int n_frames, float *vad_out);

RNNModel *nnt_model_from_bytes(const unsigned char *data, size_t len);

/* Pitch state after the last processed frame (post-octave-removal period in
 * the original-rate domain and gain in [0, 1]); either out-pointer may be
 * NULL. */
void nnt_get_pitch(DenoiseState *st, int *period, float *gain);

/* In-place biquad for host-side training augmentation (f32 state, f64
 * arithmetic; reference src/training.rs:397-400 semantics). */
void nnt_biquad_inplace(float *x, int n, const float a[2], const float b[2],
                        float mem[2]);

#ifdef __cplusplus
}
#endif

#endif /* NNT_RNNOISE_H */
