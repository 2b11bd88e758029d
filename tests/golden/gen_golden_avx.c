/* Dump golden byte vectors for the AVX2 (256-int block, 8-lane) and
 * AVX-512 (512-int block, 16-lane) pack families by calling the COMPILED
 * reference implementation, as gen_golden.c does for the SSE family.
 *
 * Build (from tests/golden/):
 *   gcc -O2 -mavx2 -mavx512f -I/root/reference/include -o gen_golden_avx \
 *       gen_golden_avx.c /root/reference/src/avxbitpacking.c \
 *       /root/reference/src/avx512bitpacking.c \
 *       /root/reference/src/simdcomputil.c
 *
 * Output: one JSON object per line:
 *   {"family":"avx"|"avx512","bit":B,"n":N,"seed":S,"maxbits":M,
 *    "packed":"<hex>"}
 * Input data is xorshift32(seed)-generated then masked to B bits, so the
 * Python side regenerates it without parsing arrays.
 */
#include <stdint.h>
#include <stdio.h>
#include <string.h>

#include "avxbitpacking.h"
#include "avx512bitpacking.h"

static uint32_t xs32(uint32_t *s) {
  uint32_t x = *s;
  x ^= x << 13; x ^= x >> 17; x ^= x << 5;
  return *s = x;
}

static void dump_hex(const uint8_t *p, size_t n) {
  for (size_t i = 0; i < n; i++) printf("%02x", p[i]);
}

int main(void) {
  uint32_t data[512];
  uint8_t out[512 * 4];
  uint32_t back[512];
  for (int family = 0; family < 2; family++) {
    int n = family == 0 ? 256 : 512;
    for (uint32_t bit = 0; bit <= 32; bit++) {
      uint32_t seed = 0x9E3779B9u + bit * 2654435761u + family;
      uint32_t s = seed;
      uint64_t mask = bit == 32 ? 0xFFFFFFFFull : ((1ull << bit) - 1);
      for (int i = 0; i < n; i++) data[i] = (uint32_t)(xs32(&s) & mask);
      memset(out, 0, sizeof(out));
      /* bit==0: the reference's avxunpackblock0/avx512unpackblock0 memset
       * only 256/512 BYTES (a quarter of the block) — pre-zero the buffer
       * so the roundtrip check compares against the intended all-zeros */
      memset(back, 0, sizeof(back));
      uint32_t mb;
      if (family == 0) {
        mb = avxmaxbits(data);
        avxpackwithoutmask(data, (__m256i *)out, bit);
        avxunpack((const __m256i *)out, back, bit);
      } else {
        mb = avx512maxbits(data);
        avx512packwithoutmask(data, (__m512i *)out, bit);
        avx512unpack((const __m512i *)out, back, bit);
      }
      if (memcmp(back, data, n * 4) != 0) {
        fprintf(stderr, "reference roundtrip failed fam=%d bit=%u\n",
                family, bit);
        return 1;
      }
      printf("{\"family\":\"%s\",\"bit\":%u,\"n\":%d,\"seed\":%u,"
             "\"maxbits\":%u,\"packed\":\"",
             family == 0 ? "avx" : "avx512", bit, n, seed, mb);
      dump_hex(out, (size_t)n / 8 * bit);  /* n*bit/32*4 bytes */
      printf("\"}\n");
    }
  }
  return 0;
}
