/* Test-support converter: SAM/BAM -> CRAM via htslib, used only to
 * build CRAM golden fixtures/oracles (the framework's own CRAM reader
 * is kmer_tpu/io/cram.py).  Build (see .claude/skills/verify/SKILL.md
 * for the htslib static lib):
 *   gcc -O2 -o tests/refbin/sam2cram scripts/sam2cram.c \
 *       -I/tmp/hts_inc /tmp/htslib_build/libhts.a -lz -lpthread -lm
 * Usage: sam2cram <in.bam> <ref.fa> <out.cram> [index] [v=3.1] [fqz] [arith]
 *   "index"  also writes <out.cram>.crai
 *   "v=X.Y"  CRAM container version (default htslib's, 3.0; v=3.1
 *            exercises the rANSNx16/tok3 codecs for the 3.1 goldens)
 *   "fqz"    CRAM_OPT_USE_FQZ (the small/archive profiles' quality codec)
 *   "arith"  CRAM_OPT_USE_ARITH (their adaptive range coder)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "htslib/sam.h"
#include "htslib/hts.h"

int main(int argc, char **argv)
{
    if (argc < 4) {
        fprintf(stderr, "Usage: sam2cram <in.bam> <ref.fa> <out.cram>\n");
        return 1;
    }
    samFile *in = sam_open(argv[1], "r");
    if (!in) { perror("open in"); return 1; }
    sam_hdr_t *hdr = sam_hdr_read(in);
    samFile *out = sam_open(argv[3], "wc");
    if (!out) { perror("open out"); return 1; }
    for (int a = 4; a < argc; a++) {
        if (argv[a][0] == 'v' && argv[a][1] == '=' &&
            hts_set_opt(out, CRAM_OPT_VERSION, argv[a] + 2) != 0) {
            fprintf(stderr, "bad CRAM version %s\n", argv[a] + 2);
            return 1;
        }
        if (strcmp(argv[a], "fqz") == 0 &&
            hts_set_opt(out, CRAM_OPT_USE_FQZ, 1) != 0)
            return 1;
        if (strcmp(argv[a], "arith") == 0 &&
            hts_set_opt(out, CRAM_OPT_USE_ARITH, 1) != 0)
            return 1;
    }
    if (hts_set_fai_filename(out, argv[2]) != 0) {
        fprintf(stderr, "failed to set reference %s\n", argv[2]);
        return 1;
    }
    if (sam_hdr_write(out, hdr) != 0) return 1;
    bam1_t *b = bam_init1();
    int r;
    while ((r = sam_read1(in, hdr, b)) >= 0)
        if (sam_write1(out, hdr, b) < 0) return 1;
    bam_destroy1(b);
    if (sam_close(out) != 0) return 1;
    sam_close(in);
    sam_hdr_destroy(hdr);
    if (r != -1) return 1;
    for (int a = 4; a < argc; a++)      /* "index": also write .crai */
        if (argv[a][0] == 'i')
            return sam_index_build(argv[3], 0) == 0 ? 0 : 1;
    return 0;
}
