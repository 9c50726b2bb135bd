/* Reference Codec2 1300 DECODER as a golden consumer: reads packed
 * 52-bit frames ("in_bits.u8", 7 bytes/frame) produced by THIS repo's
 * encoder (uhsdr_tpu/modems/codec2_1300.py Codec2Encoder1300) and
 * writes the reference decoder's speech ("ref_dec.i16") — closing the
 * vocoder interop loop in the encode direction
 * (tests/test_codec2_golden.py).  Same build recipe as
 * tools/gen_codec2_ref.c.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "codec2.h"

int main(int argc, char **argv) {
    /* optional argv[1]: "700C" selects CODEC2_MODE_700C. */
    int mode = CODEC2_MODE_1300;
    if (argc > 1 && strcmp(argv[1], "700C") == 0) mode = CODEC2_MODE_700C;
    struct CODEC2 *dec = codec2_create(mode);
    if (!dec) { fprintf(stderr, "create failed\n"); return 1; }
    int nsam = codec2_samples_per_frame(dec);
    int nbit = codec2_bits_per_frame(dec);
    int nbyte = (nbit + 7) / 8;
    FILE *fi = fopen("in_bits.u8", "rb");
    if (!fi) { fprintf(stderr, "no in_bits.u8\n"); return 1; }
    FILE *fo = fopen("ref_dec.i16", "wb");
    unsigned char *bits = malloc(nbyte);
    short *out = malloc(sizeof(short) * nsam);
    while (fread(bits, 1, nbyte, fi) == (size_t)nbyte) {
        codec2_decode(dec, out, bits);
        fwrite(out, sizeof(short), nsam, fo);
    }
    fclose(fi); fclose(fo);
    return 0;
}
