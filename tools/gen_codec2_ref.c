/* Codec2 1300-mode golden generator (VERDICT r2 item 2): runs the
 * REFERENCE's own codec (drivers/freedv/codec2.c compiled from
 * /root/reference source) over synthetic speech, dumping
 *   enc_bits.u8   - packed 52-bit frames (8 bytes/frame as packed)
 *   dec_pcm.i16   - the reference decoder's output speech
 *   in_pcm.i16    - the input speech actually encoded
 * so the repo's independent decoder (uhsdr_tpu/modems/codec2_1300.py)
 * can be checked bit-stream-in, waveform-out against the reference.
 *
 * Input speech is read from "speech_in.i16" (320*N samples int16 @8k).
 * Built by tests/test_codec2_golden.py (same recipe as gen_ofdm_ref.c).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "codec2.h"

int main(int argc, char **argv) {
    /* optional argv[1]: "700C" selects CODEC2_MODE_700C (the 700D radio
     * mode's vocoder); default remains 1300 (the 1600 radio mode's). */
    int mode = CODEC2_MODE_1300;
    if (argc > 1 && strcmp(argv[1], "700C") == 0) mode = CODEC2_MODE_700C;
    struct CODEC2 *enc = codec2_create(mode);
    struct CODEC2 *dec = codec2_create(mode);
    if (!enc || !dec) { fprintf(stderr, "create failed\n"); return 1; }
    if (mode == CODEC2_MODE_1300)
        codec2_open_lspEWov(dec, "feat.f32");   /* lsps/e/Wo/v/ak dump */
    int nsam = codec2_samples_per_frame(enc);       /* 320 */
    int nbit = codec2_bits_per_frame(enc);          /* 52  */
    int nbyte = (nbit + 7) / 8;
    fprintf(stderr, "nsam=%d nbit=%d\n", nsam, nbit);

    FILE *fi = fopen("speech_in.i16", "rb");
    if (!fi) { fprintf(stderr, "no speech_in.i16\n"); return 1; }
    FILE *fin = fopen("in_pcm.i16", "wb");
    FILE *fb = fopen("enc_bits.u8", "wb");
    FILE *fo = fopen("dec_pcm.i16", "wb");
    short *speech = malloc(sizeof(short) * nsam);
    short *out = malloc(sizeof(short) * nsam);
    unsigned char *bits = malloc(nbyte);
    while (fread(speech, sizeof(short), nsam, fi) == (size_t)nsam) {
        codec2_encode(enc, bits, speech);
        fwrite(speech, sizeof(short), nsam, fin);
        fwrite(bits, 1, nbyte, fb);
        codec2_decode(dec, out, bits);
        fwrite(out, sizeof(short), nsam, fo);
    }
    fclose(fi); fclose(fin); fclose(fb); fclose(fo);
    return 0;
}
