/* Golden-vector dumper: links against the UNMODIFIED reference at
 * /root/reference and prints JSON lines of (family, bit, len, init, data,
 * packed-hex).  Build (see tests/golden/README.md):
 *   gcc -O2 -msse4.1 -I/root/reference/include -o gen_golden gen_golden.c \
 *       /root/reference/src/simdbitpacking.c /root/reference/src/simdcomputil.c \
 *       /root/reference/src/simdfor.c /root/reference/src/simdintegratedbitpacking.c
 * Output checked in as golden.jsonl; pytest replays it against the numpy
 * kernels (bit-identity per BASELINE.json north rule).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "simdbitpacking.h"
#include "simdcomputil.h"
#include "simdfor.h"
#include "simdintegratedbitpacking.h"

static unsigned long long lcg_state = 88172645463325252ULL;
static uint32_t lcg(void) {
  lcg_state = lcg_state * 6364136223846793005ULL + 1442695040888963407ULL;
  return (uint32_t)(lcg_state >> 32);
}

static void print_row(const char *family, int bit, int len, uint32_t init,
                      const uint32_t *data, const uint8_t *packed, int nbytes) {
  int i;
  printf("{\"family\":\"%s\",\"bit\":%d,\"len\":%d,\"init\":%u,\"data\":[",
         family, bit, len, init);
  for (i = 0; i < len; i++) printf(i ? ",%u" : "%u", data[i]);
  printf("],\"packed\":\"");
  for (i = 0; i < nbytes; i++) printf("%02x", packed[i]);
  printf("\"}\n");
}

int main(void) {
  static uint32_t data[4096];
  static uint8_t out[4 * 4096 + 64];
  int lens[] = {0, 1, 2, 3, 4, 5, 7, 8, 31, 32, 100, 127, 128, 129, 255, 256, 257, 1000};
  int nlens = sizeof(lens) / sizeof(lens[0]);
  int bit, li, i;

  /* plain bit-packing, simdpack_length (masked; data pre-masked so the
   * withoutmask kernels would produce identical bytes) */
  for (bit = 0; bit <= 32; bit++) {
    for (li = 0; li < nlens; li++) {
      int len = lens[li];
      uint32_t mask = (bit == 32) ? 0xFFFFFFFFu : ((1u << bit) - 1);
      for (i = 0; i < len; i++) data[i] = lcg() & mask;
      memset(out, 0, sizeof(out));
      {
        __m128i *end = simdpack_length(data, (size_t)len, (__m128i *)out, bit);
        int nbytes = (int)((uint8_t *)end - out);
        /* b==32 shortlength advances by padded words; report true size */
        int expect = simdpack_compressedbytes(len, bit);
        if (nbytes != expect && bit != 32) {
          fprintf(stderr, "size mismatch plain bit=%d len=%d: %d vs %d\n",
                  bit, len, nbytes, expect);
          return 1;
        }
        print_row("plain", bit, len, 0, data, out, expect);
      }
    }
  }

  /* FOR, simdpackFOR_length with init = min */
  for (bit = 0; bit <= 32; bit++) {
    for (li = 0; li < nlens; li++) {
      int len = lens[li];
      uint32_t mask = (bit == 32) ? 0xFFFFFFFFu : ((1u << bit) - 1);
      uint32_t base = 1000003u;
      uint32_t mn;
      for (i = 0; i < len; i++) data[i] = base + (lcg() & mask);
      mn = len ? data[0] : base;
      for (i = 1; i < len; i++) if (data[i] < mn) mn = data[i];
      if (bit == 32) mn = 0; /* keep residual width 32 meaningful: raw copy */
      memset(out, 0, sizeof(out));
      {
        __m128i *end = simdpackFOR_length(mn, data, len, (__m128i *)out, bit);
        int expect = simdpackFOR_compressedbytes(len, bit);
        (void)end;
        print_row("for", bit, len, mn, data, out, expect);
      }
    }
  }

  /* d1, simdpackwithoutmaskd1 over full 128-blocks, chained offsets as in
   * example.c:56-75 */
  for (bit = 1; bit <= 32; bit++) {
    int nblk = 2;
    uint32_t init = (bit % 3 == 0) ? 0 : 123456u;
    uint32_t acc = init;
    uint32_t mask = (bit == 32) ? 0xFFFFFFFFu : ((1u << bit) - 1);
    for (i = 0; i < nblk * 128; i++) {
      acc += lcg() & mask; /* wraps mod 2^32 like the reference deltas */
      data[i] = acc;
    }
    memset(out, 0, sizeof(out));
    {
      uint32_t offset = init;
      uint8_t *p = out;
      int blk;
      for (blk = 0; blk < nblk; blk++) {
        uint32_t b = simdmaxbitsd1(offset, data + blk * 128);
        simdpackwithoutmaskd1(offset, data + blk * 128, (__m128i *)p, b);
        offset = data[blk * 128 + 127];
        /* emit one row per block so init is explicit */
        print_row("d1", (int)b, 128, blk == 0 ? init : data[blk * 128 - 1],
                  data + blk * 128, p, simdpack_compressedbytes(128, b));
        p += simdpack_compressedbytes(128, b);
      }
    }
  }

  /* analyzers: maxbits / simdmaxbitsd1_length sweep */
  for (li = 0; li < nlens; li++) {
    int len = lens[li];
    if (len == 0) continue;
    for (i = 0; i < len; i++) data[i] = lcg();
    printf("{\"family\":\"maxbits\",\"bit\":%d,\"len\":%d,\"init\":0,\"data\":[",
           (int)maxbits_length(data, (uint32_t)len), len);
    for (i = 0; i < len; i++) printf(i ? ",%u" : "%u", data[i]);
    printf("],\"packed\":\"\"}\n");
    printf("{\"family\":\"maxbitsd1\",\"bit\":%d,\"len\":%d,\"init\":7,\"data\":[",
           (int)simdmaxbitsd1_length(7u, data, (uint32_t)len), len);
    for (i = 0; i < len; i++) printf(i ? ",%u" : "%u", data[i]);
    printf("],\"packed\":\"\"}\n");
  }

  /* compressed-domain select/search on FOR (tests/unit.c:645-692 shape) */
  {
    uint32_t mn, mx, b;
    int len = 128;
    uint32_t acc = 50000;
    for (i = 0; i < len; i++) { acc += lcg() & 0xFF; data[i] = acc; }
    mn = data[0]; mx = data[0];
    for (i = 1; i < len; i++) { if (data[i] < mn) mn = data[i]; if (data[i] > mx) mx = data[i]; }
    b = bits(mx - mn);
    memset(out, 0, sizeof(out));
    simdpackFOR(mn, data, (__m128i *)out, b);
    for (i = 0; i < len; i += 17) {
      uint32_t v = simdselectFOR(mn, (__m128i *)out, b, i);
      printf("{\"family\":\"selectFOR\",\"bit\":%d,\"len\":%d,\"init\":%u,"
             "\"data\":[%d,%u],\"packed\":\"\"}\n", (int)b, len, mn, i, v);
    }
    for (i = 0; i < len; i += 29) {
      uint32_t res;
      int idx = simdsearchwithlengthFOR(mn, (__m128i *)out, b, len, data[i] , &res);
      printf("{\"family\":\"searchFOR\",\"bit\":%d,\"len\":%d,\"init\":%u,"
             "\"data\":[%u,%d,%u],\"packed\":\"\"}\n", (int)b, len, mn,
             data[i], idx, res);
    }
  }
  return 0;
}
