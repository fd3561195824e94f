// crc32c (Castagnoli) — slice-by-8 table-driven implementation.
//
// Backs tools/tf_bundle.py's checkpoint-bundle verification: the TF tensor
// bundle format (reference checkpoints, read_checkpoint.py:1-16) carries a
// masked crc32c per tensor and per index block; a pure-Python CRC runs at
// ~1-3 MB/s, which would add minutes to importing a real multi-hundred-MB
// checkpoint.  This runs at memory speed (~GB/s).  Python falls back to the
// table-driven loop when the shared library is absent.
//
// Build: make -C native  ->  native/libcrc32c.so

#include <cstddef>
#include <cstdint>
#include <mutex>

namespace {

uint32_t kTab[8][256];
std::once_flag init_flag;  // ctypes releases the GIL: first calls can race

void build_tables() {
  const uint32_t poly = 0x82F63B78u;  // reflected Castagnoli
  for (uint32_t n = 0; n < 256; ++n) {
    uint32_t c = n;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ poly : c >> 1;
    kTab[0][n] = c;
  }
  for (uint32_t n = 0; n < 256; ++n) {
    uint32_t c = kTab[0][n];
    for (int s = 1; s < 8; ++s) {
      c = kTab[0][c & 0xFF] ^ (c >> 8);
      kTab[s][n] = c;
    }
  }
}

}  // namespace

extern "C" uint32_t crc32c_update(uint32_t crc, const uint8_t* data,
                                  size_t len) {
  std::call_once(init_flag, build_tables);
  uint32_t c = crc ^ 0xFFFFFFFFu;
  // byte-align is unnecessary for correctness; process 8 bytes at a time
  while (len >= 8) {
    uint32_t lo = c ^ (uint32_t(data[0]) | uint32_t(data[1]) << 8 |
                       uint32_t(data[2]) << 16 | uint32_t(data[3]) << 24);
    uint32_t hi = uint32_t(data[4]) | uint32_t(data[5]) << 8 |
                  uint32_t(data[6]) << 16 | uint32_t(data[7]) << 24;
    c = kTab[7][lo & 0xFF] ^ kTab[6][(lo >> 8) & 0xFF] ^
        kTab[5][(lo >> 16) & 0xFF] ^ kTab[4][lo >> 24] ^
        kTab[3][hi & 0xFF] ^ kTab[2][(hi >> 8) & 0xFF] ^
        kTab[1][(hi >> 16) & 0xFF] ^ kTab[0][hi >> 24];
    data += 8;
    len -= 8;
  }
  while (len--) c = kTab[0][(c ^ *data++) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}
