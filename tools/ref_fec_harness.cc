// Cross-validation harness for the reference receiver's FEC chain.
//
// Compiles the reference's OWN Qt-free sources (viterbi.cpp,
// deconvolve.cpp, protTables.cpp, spiral-no-sse.c — read-only under
// /root/reference) and dumps, in machine-readable form:
//
//   pcodes              all 24 PI puncturing vectors (protTables.cpp)
//   uep <br> <pl>       UEP depuncture layout: the viterbiBlock marker
//                       pattern after deconvolving v[i] = (i % 30000)+1
//   eepa <br> <pl>      EEP profile A layout (protLevel | 0100)
//   eepb <br> <pl>      EEP profile B layout (protLevel | 0200)
//   vit <nbits> <seed>  reference Viterbi decode of pseudorandom soft
//                       input in [-127, 127] (the DAB softbit range)
//
// tools/ref_fec_check.py builds this file and diffs every output against
// dabjax's fec/puncture.py + fec/viterbi.py, converting "matches our
// modulator" into "matches the reference binary" for the whole Table 33
// surface (VERDICT r4 next #4).
//
// Build (see ref_fec_check.py):
//   g++ -O2 -DNO_SSE -I<ref>/includes -I<ref>/includes/backend \
//       ref_fec_harness.cc <ref>/src/backend/viterbi.cpp \
//       <ref>/src/backend/deconvolve.cpp <ref>/src/backend/protTables.cpp \
//       <ref>/src/backend/spiral-code/spiral-no-sse.c -o ref_fec

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

// pull system + viterbi headers in first with normal access...
#include "viterbi.h"
// ...then expose the deconvolve classes' L1..L4 / PI pointers /
// viterbiBlock for layout extraction (test harness only; member layout
// is unchanged — deconvolve.h's own `#include <viterbi.h>` is skipped by
// its include guard, so the access hack touches only these two classes)
#define private public
#include "deconvolve.h"
#undef private

extern int8_t *get_PCodes(int16_t);

static void dump_pcodes() {
    for (int p = 0; p < 24; p++) {
        int8_t *v = get_PCodes(p);
        for (int j = 0; j < 32; j++) printf("%d%c", v[j],
                                            j == 31 ? '\n' : ' ');
    }
}

template <class D>
static void dump_layout(D &dec, int bitRate) {
    int outSize = 24 * bitRate;
    int total = outSize * 4 + 24;
    int16_t *v = new int16_t[total];
    for (int i = 0; i < total; i++) v[i] = (int16_t)((i % 30000) + 1);
    uint8_t *out = new uint8_t[outSize];
    dec.deconvolve(v, total, out);
    // viterbiBlock retains the depunctured marker layout: position j got
    // input marker v[k] (k = count of kept positions before j) or 0
    for (int j = 0; j < total; j++)
        printf("%d%c", dec.viterbiBlock[j], j == total - 1 ? '\n' : ' ');
    delete[] v;
    delete[] out;
}

static uint32_t rng_state;
static int16_t next_soft() {     // xorshift32 -> [-127, 127]
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 17;
    rng_state ^= rng_state << 5;
    return (int16_t)((rng_state % 255) - 127);
}

static void dump_vit(int nbits, uint32_t seed) {
    rng_state = seed ? seed : 1;
    int total = (nbits + 6) * 4;
    int16_t *v = new int16_t[total];
    for (int i = 0; i < total; i++) v[i] = next_soft();
    viterbi dec(nbits);
    uint8_t *out = new uint8_t[nbits];
    dec.deconvolve(v, out);
    for (int i = 0; i < nbits; i++) printf("%d", out[i]);
    printf("\n");
    delete[] v;
    delete[] out;
}

int main(int argc, char **argv) {
    if (argc < 2) return 2;
    if (!strcmp(argv[1], "pcodes")) { dump_pcodes(); return 0; }
    if (!strcmp(argv[1], "uep") && argc == 4) {
        uep_deconvolve d((int16_t)atoi(argv[2]), (int16_t)atoi(argv[3]));
        dump_layout(d, atoi(argv[2]));
        return 0;
    }
    if (!strcmp(argv[1], "eepa") && argc == 4) {
        eep_deconvolve d((int16_t)atoi(argv[2]),
                         (int16_t)(0100 | atoi(argv[3])));
        dump_layout(d, atoi(argv[2]));
        return 0;
    }
    if (!strcmp(argv[1], "eepb") && argc == 4) {
        eep_deconvolve d((int16_t)atoi(argv[2]),
                         (int16_t)(0200 | atoi(argv[3])));
        dump_layout(d, atoi(argv[2]));
        return 0;
    }
    if (!strcmp(argv[1], "vit") && argc == 4) {
        dump_vit(atoi(argv[2]), (uint32_t)strtoul(argv[3], 0, 10));
        return 0;
    }
    return 2;
}
