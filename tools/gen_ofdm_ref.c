#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "codec2_ofdm.h"
#include "ofdm_internal.h"

int main(void) {
    struct OFDM *ofdm = ofdm_create(&(struct OFDM_CONFIG){0});
    if (!ofdm) { fprintf(stderr, "create failed\n"); return 1; }
    struct OFDM_CONFIG *c = ofdm_get_config_param();
    int nbits = ofdm_get_bits_per_frame();
    int nsam = ofdm_get_samples_per_frame();
    fprintf(stderr, "fs=%f rs=%f ts=%f nc=%d ns=%d bpf=%d spf=%d tcp=%f centre=%f\n",
            c->fs, c->rs, c->ts, c->nc, c->ns, nbits, nsam, c->tcp, c->tx_centre);
    int nframes = 30;
    FILE *fb = fopen("bits.i32", "wb");
    FILE *fs = fopen("tx.c64", "wb");
    srand(42);
    int *bits = malloc(sizeof(int) * nbits);
    COMP *tx = malloc(sizeof(COMP) * nsam);
    for (int f = 0; f < nframes; f++) {
        for (int i = 0; i < nbits; i++) bits[i] = rand() & 1;
        ofdm_mod(ofdm, tx, bits);
        fwrite(bits, sizeof(int), nbits, fb);
        for (int i = 0; i < nsam; i++) {
            float re = tx[i].real, im = tx[i].imag;
            fwrite(&re, 4, 1, fs); fwrite(&im, 4, 1, fs);
        }
    }
    fclose(fb); fclose(fs);
    return 0;
}
