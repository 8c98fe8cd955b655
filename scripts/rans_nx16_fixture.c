/* Test-support encoder: produce rANS Nx16 / tok3 compressed blobs with
 * htscodecs (the behavioral reference for kmer_tpu/io/cram31.py) so the
 * unit tests can decode them and compare against the original bytes.
 * Build (see .claude/skills/verify/SKILL.md for the htslib static lib):
 *   gcc -O2 -o tests/refbin/rans_nx16_fixture scripts/rans_nx16_fixture.c \
 *       -I/tmp/htslib_build -I/tmp/htslib_build/htscodecs \
 *       /tmp/htslib_build/libhts.a -lz -lpthread -lm
 * Usage:
 *   rans_nx16_fixture rans <order> <in> <out>   rANS Nx16 container;
 *       <order> is the RANS_ORDER_* flag bitmask in decimal
 *       (1=O1 4=X32 8=STRIPE 32=CAT 64=RLE 128=PACK)
 *   rans_nx16_fixture arith <order> <in> <out>  arith container
 *       (1=O1 4=EXT/bz2 8=STRIPE 32=CAT 64=RLE 128=PACK)
 *   rans_nx16_fixture tok3 <level> <in> <out>   tok3 name block over
 *       \n-separated names (use_arith=0)
 *   rans_nx16_fixture tok3a <level> <in> <out>  tok3 with use_arith=1
 *   rans_nx16_fixture fqz <strat> <in> <out>    fqzcomp quality block
 *       over \n-separated per-read quality strings
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>
#include "htscodecs/rANS_static4x16.h"
#include "htscodecs/arith_dynamic.h"
#include "htscodecs/tokenise_name3.h"
#include "htscodecs/fqzcomp_qual.h"

int main(int argc, char **argv)
{
    if (argc != 5) {
        fprintf(stderr, "Usage: rans_nx16_fixture rans|tok3 <order|level> "
                        "<in> <out>\n");
        return 1;
    }
    FILE *f = fopen(argv[3], "rb");
    if (!f) { perror(argv[3]); return 1; }
    fseek(f, 0, SEEK_END);
    long in_sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    unsigned char *in = malloc(in_sz);
    if (fread(in, 1, in_sz, f) != (size_t)in_sz) return 1;
    fclose(f);

    unsigned char *out;
    unsigned int out_sz = 0;
    if (strcmp(argv[1], "rans") == 0) {
        out = rans_compress_to_4x16(in, in_sz, NULL, &out_sz, atoi(argv[2]));
    } else if (strcmp(argv[1], "arith") == 0) {
        out = arith_compress_to(in, in_sz, NULL, &out_sz, atoi(argv[2]));
    } else if (strcmp(argv[1], "fqz") == 0 || strcmp(argv[1], "fqz3") == 0) {
        /* input: \n-separated per-read quality strings; the slice
         * carries per-record lengths (fqz_compress reads s->len) */
        int nrec = 0, i;
        for (i = 0; i < in_sz; i++) nrec += in[i] == '\n';
        uint32_t *lens = calloc(nrec ? nrec : 1, sizeof(*lens));
        uint32_t *flags = calloc(nrec ? nrec : 1, sizeof(*flags));
        unsigned char *quals = malloc(in_sz);
        int qlen = 0, rec = 0, start = 0;
        for (i = 0; i < in_sz; i++) {
            if (in[i] == '\n') {
                lens[rec++] = i - start;
                start = i + 1;
            } else {
                quals[qlen++] = in[i];
            }
        }
        /* "fqz3" encodes at CRAM version 3.0 (GFLAG_DO_REV; odd
         * records flagged reverse) */
        int v3 = argv[1][3] == '3';
        if (v3)
            for (i = 0; i < rec; i++)
                flags[i] = (i & 1) ? 16 /* FQZ_FREVERSE */ : 0;
        fqz_slice s = { rec, lens, flags };
        size_t csz = 0;
        out = (unsigned char *)fqz_compress(v3 ? 3 : 4, &s, (char *)quals,
                                            qlen, &csz, atoi(argv[2]), NULL);
        out_sz = csz;
        in_sz = qlen; /* report the raw qual length */
    } else if (strcmp(argv[1], "tok3a") == 0) {
        out = tok3_encode_names((char *)in, in_sz, atoi(argv[2]), 1,
                                (int *)&out_sz, NULL);
    } else {
        out = tok3_encode_names((char *)in, in_sz, atoi(argv[2]), 0,
                                (int *)&out_sz, NULL);
    }
    if (!out) { fprintf(stderr, "encode failed\n"); return 1; }
    f = fopen(argv[4], "wb");
    if (!f) { perror(argv[4]); return 1; }
    fwrite(out, 1, out_sz, f);
    fclose(f);
    printf("%ld %u\n", in_sz, out_sz);
    return 0;
}
