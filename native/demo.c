/* Minimal C consumer of the RNNoise-compatible ABI (rnnoise.h).
 *
 * Reads raw 48 kHz mono LE i16 from argv[1], denoises with the built-in
 * model (or argv[3] as a .rnn file), writes raw LE i16 to argv[2].  The
 * framework's analogue of the reference CI's C-API smoke test: its output
 * is diffed against the Python binding's output in tests/test_native.py.
 */

#include <stdio.h>
#include <stdlib.h>

#include "rnnoise.h"

int main(int argc, char **argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s in.raw out.raw [model.rnn]\n", argv[0]);
    return 2;
  }
  FILE *fin = fopen(argv[1], "rb");
  FILE *fout = fopen(argv[2], "wb");
  if (!fin || !fout) {
    fprintf(stderr, "cannot open input/output\n");
    return 1;
  }
  RNNModel *model = NULL;
  if (argc > 3) {
    FILE *fm = fopen(argv[3], "rb");
    if (!fm || !(model = rnnoise_model_from_file(fm))) {
      fprintf(stderr, "bad model file\n");
      return 1;
    }
    fclose(fm);
  }

  const int frame_size = rnnoise_get_frame_size();
  DenoiseState *st = rnnoise_create(model);
  short *pcm = malloc(sizeof(short) * frame_size);
  float *buf = malloc(sizeof(float) * frame_size);
  int first = 1;
  while (fread(pcm, sizeof(short), frame_size, fin) == (size_t)frame_size) {
    int i;
    for (i = 0; i < frame_size; i++) buf[i] = (float)pcm[i];
    rnnoise_process_frame(st, buf, buf);
    for (i = 0; i < frame_size; i++) {
      float v = buf[i];
      if (v > 32767.0f) v = 32767.0f;
      if (v < -32768.0f) v = -32768.0f;
      pcm[i] = (short)v;
    }
    if (!first) fwrite(pcm, sizeof(short), frame_size, fout);
    first = 0; /* drop the fade-in frame, like the reference CLI */
  }
  rnnoise_destroy(st);
  if (model) rnnoise_model_free(model);
  free(pcm);
  free(buf);
  fclose(fin);
  fclose(fout);
  return 0;
}
