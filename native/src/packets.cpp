// Packet engine: m-sequence PRBS payloads, packet framing, BER oracle.
//
// Native analog of the reference's traffic payload path: liquid's
// msequence_create_default(12) fills a known payload
// (src/crts_cognitive_radio.cpp:750-764), packet numbers are stamped into
// the first 4 bytes, and the receiver computes true BER against the known
// sequence by XOR + popcount (src/extensible_cognitive_radio.cpp:1586-1594).
// Bit-identical to the Python implementations in signal/msequence.py and
// runtime/traffic.py so either side can generate / verify the other's
// packets.

#include "crn_runtime.h"

#include <cstring>

extern "C" {

void crn_msequence_bytes(uint32_t m, uint32_t gen_poly, uint32_t init_state,
                         uint8_t *out, uint64_t n) {
  const uint32_t mask = (m >= 32) ? 0xFFFFFFFFu : ((1u << m) - 1u);
  uint32_t state = init_state & mask;
  if (state == 0) state = 1;
  gen_poly &= mask;
  for (uint64_t i = 0; i < n; i++) {
    uint8_t byte = 0;
    for (int b = 0; b < 8; b++) {
      uint32_t fb = __builtin_parity(state & gen_poly);
      uint32_t outbit = (state >> (m - 1)) & 1u;
      state = ((state << 1) | fb) & mask;
      byte = static_cast<uint8_t>((byte << 1) | outbit);
    }
    out[i] = byte;
  }
}

void crn_fill_packets(uint8_t *out, uint32_t num_packets, uint32_t packet_len,
                      uint32_t first_num, const uint8_t *payload_template) {
  for (uint32_t p = 0; p < num_packets; p++) {
    uint8_t *pkt = out + static_cast<uint64_t>(p) * packet_len;
    std::memcpy(pkt, payload_template, packet_len);
    uint32_t num = first_num + p;
    pkt[0] = static_cast<uint8_t>(num);
    pkt[1] = static_cast<uint8_t>(num >> 8);
    pkt[2] = static_cast<uint8_t>(num >> 16);
    pkt[3] = static_cast<uint8_t>(num >> 24);
  }
}

uint32_t crn_packet_number(const uint8_t *packet) {
  return static_cast<uint32_t>(packet[0]) |
         (static_cast<uint32_t>(packet[1]) << 8) |
         (static_cast<uint32_t>(packet[2]) << 16) |
         (static_cast<uint32_t>(packet[3]) << 24);
}

uint64_t crn_bit_errors(const uint8_t *a, const uint8_t *b, uint64_t n) {
  uint64_t errs = 0;
  uint64_t i = 0;
  for (; i + 8 <= n; i += 8) {
    uint64_t xa, xb;
    std::memcpy(&xa, a + i, 8);
    std::memcpy(&xb, b + i, 8);
    errs += static_cast<uint64_t>(__builtin_popcountll(xa ^ xb));
  }
  for (; i < n; i++)
    errs += static_cast<uint64_t>(__builtin_popcount(a[i] ^ b[i]));
  return errs;
}

}  // extern "C"
