/* fastset golden dumper: pack a block with the reference, apply
 * simdfastset/simdfastsetFOR at several slots, dump bytes after each. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "simdbitpacking.h"
#include "simdcomputil.h"
#include "simdfor.h"

static unsigned long long st = 424242ULL;
static uint32_t lcg(void) {
  st = st * 6364136223846793005ULL + 1442695040888963407ULL;
  return (uint32_t)(st >> 32);
}

static void dump(const char *family, int bit, int slot, uint32_t value,
                 uint32_t init, const uint8_t *p, int n) {
  int i;
  printf("{\"family\":\"%s\",\"bit\":%d,\"len\":%d,\"init\":%u,\"data\":[%d,%u],\"packed\":\"",
         family, bit, 128, init, slot, value);
  for (i = 0; i < n; i++) printf("%02x", p[i]);
  printf("\"}\n");
}

int main(void) {
  static uint32_t data[128];
  static uint8_t out[128 * 4 + 64];
  int bit, slot;
  for (bit = 1; bit <= 32; bit += 3) {
    uint32_t mask = (bit == 32) ? 0xFFFFFFFFu : ((1u << bit) - 1);
    int i;
    for (i = 0; i < 128; i++) data[i] = lcg() & mask;
    simdpackwithoutmask(data, (__m128i *)out, bit);
    for (slot = 0; slot < 128; slot += 37) {
      uint32_t v = lcg() & mask;
      simdfastset((__m128i *)out, bit, v, (size_t)slot);
      dump("fastset", bit, slot, v, 0, out, simdpack_compressedbytes(128, bit));
    }
  }
  for (bit = 2; bit <= 30; bit += 7) {
    uint32_t mask = (1u << bit) - 1;
    uint32_t init = 1000;
    int i;
    for (i = 0; i < 128; i++) data[i] = init + (lcg() & mask);
    simdpackFOR(init, data, (__m128i *)out, bit);
    for (slot = 5; slot < 128; slot += 41) {
      uint32_t v = init + (lcg() & mask);
      simdfastsetFOR(init, (__m128i *)out, bit, v, (size_t)slot);
      dump("fastsetFOR", bit, slot, v, init, out,
           simdpackFOR_compressedbytes(128, bit));
    }
  }
  return 0;
}
