/* Golden CONSUMER for FDMDV interop (VERDICT r2 item 8): run the
 * reference firmware's own demodulator (drivers/freedv/fdmdv.c,
 * fdmdv_demod :560-700) over modem IQ produced by THIS repo's
 * FdmdvModulator (uhsdr_tpu/modems/fdmdv.py), so the 1600-mode TX
 * interop proof closes in both directions.
 *
 * Built and driven by tests/test_fdmdv_tx_golden.py (the same recipe as
 * tools/gen_ofdm_ref.c).  Reads "tx_in.c64" (complex64 IQ @8 kHz) from
 * the cwd, writes "rx_bits.i32" (Nc*2 ints per demod call) and
 * "sync.i32" (reliable_sync_bit per call).
 */
#include <stdio.h>
#include <stdlib.h>
#include "codec2_fdmdv.h"
#include "comp.h"

#define NC 16   /* FreeDV 1600: freedv_api.c:143 */

int main(void) {
    FILE *fi = fopen("tx_in.c64", "rb");
    if (!fi) { fprintf(stderr, "no tx_in.c64\n"); return 1; }
    fseek(fi, 0, SEEK_END);
    long nbytes = ftell(fi);
    fseek(fi, 0, SEEK_SET);
    long nsam = nbytes / 8;
    COMP *rx = malloc(sizeof(COMP) * nsam);
    for (long i = 0; i < nsam; i++) {
        float re, im;
        if (fread(&re, 4, 1, fi) != 1 || fread(&im, 4, 1, fi) != 1) break;
        rx[i].real = re; rx[i].imag = im;
    }
    fclose(fi);

    struct FDMDV *f = fdmdv_create(NC);
    if (!f) { fprintf(stderr, "create failed\n"); return 1; }
    FILE *fb = fopen("rx_bits.i32", "wb");
    FILE *fsync = fopen("sync.i32", "wb");
    int rx_bits[2 * NC];
    int reliable_sync_bit;
    long pos = 0;
    int nin = FDMDV_NOM_SAMPLES_PER_FRAME;
    while (pos + nin <= nsam) {
        int consumed = nin;   /* fdmdv_demod consumes nin samples and
                                 overwrites *nin for the NEXT call
                                 (timing-tracking 158/160/162) */
        fdmdv_demod(f, rx_bits, &reliable_sync_bit, rx + pos, &nin);
        pos += consumed;
        fwrite(rx_bits, sizeof(int), 2 * NC, fb);
        fwrite(&reliable_sync_bit, sizeof(int), 1, fsync);
    }
    fclose(fb); fclose(fsync);
    fprintf(stderr, "demodulated %ld samples\n", pos);
    return 0;
}
