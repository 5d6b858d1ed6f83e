// Binary log engine: CRC32-framed append-only record streams.
//
// Native analog of the reference's binary logging
// (src/extensible_cognitive_radio.cpp:1844-1864 dumps raw metric_s /
// parameter structs; src/convert_logs_bin_to_octave.cpp re-reads them with
// layout-coupled fread).  Here every record is explicitly framed
// [u32 len][u32 crc32][payload] behind a buffered writer, so logs are
// self-describing, integrity-checked, and layout-decoupled (the Python side
// packs/unpacks payloads with struct formats recorded in the stream name).

#include "crn_runtime.h"

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr char kMagic[4] = {'C', 'R', 'N', 'L'};
constexpr uint32_t kVersion = 1;

uint32_t crc_table[256];
bool crc_init_done = false;

void crc_init() {
  if (crc_init_done) return;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[i] = c;
  }
  crc_init_done = true;
}

void put_u32(std::string &buf, uint32_t v) {
  char b[4] = {static_cast<char>(v), static_cast<char>(v >> 8),
               static_cast<char>(v >> 16), static_cast<char>(v >> 24)};
  buf.append(b, 4);
}

uint32_t get_u32(const uint8_t *p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

}  // namespace

struct crn_binlog {
  FILE *f = nullptr;
  bool write_mode = false;
  std::string buffer;            // write-side staging buffer
  std::string name;
  // read side: whole file + record offsets
  std::vector<uint8_t> data;
  std::vector<std::pair<uint64_t, uint32_t>> records;  // (payload off, len)
};

extern "C" {

uint32_t crn_crc32(const void *data, uint64_t len) {
  crc_init();
  const uint8_t *p = static_cast<const uint8_t *>(data);
  uint32_t c = 0xFFFFFFFFu;
  for (uint64_t i = 0; i < len; i++)
    c = crc_table[(c ^ p[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

crn_binlog *crn_binlog_create(const char *path, const char *stream_name) {
  FILE *f = std::fopen(path, "wb");
  if (!f) return nullptr;
  auto *l = new crn_binlog();
  l->f = f;
  l->write_mode = true;
  l->name = stream_name ? stream_name : "";
  std::string hdr(kMagic, 4);
  put_u32(hdr, kVersion);
  put_u32(hdr, static_cast<uint32_t>(l->name.size()));
  hdr += l->name;
  std::fwrite(hdr.data(), 1, hdr.size(), f);
  return l;
}

crn_binlog *crn_binlog_open(const char *path) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto *l = new crn_binlog();
  l->write_mode = false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz < 12) {
    std::fclose(f);
    delete l;
    return nullptr;
  }
  l->data.resize(static_cast<size_t>(sz));
  if (std::fread(l->data.data(), 1, l->data.size(), f) != l->data.size() ||
      std::memcmp(l->data.data(), kMagic, 4) != 0) {
    std::fclose(f);
    delete l;
    return nullptr;
  }
  std::fclose(f);
  uint32_t name_len = get_u32(l->data.data() + 8);
  uint64_t off = 12 + name_len;
  if (off > l->data.size()) {
    delete l;
    return nullptr;
  }
  l->name.assign(reinterpret_cast<const char *>(l->data.data() + 12),
                 name_len);
  while (off + 8 <= l->data.size()) {
    uint32_t len = get_u32(l->data.data() + off);
    if (off + 8 + len > l->data.size()) break;  // truncated tail: drop
    l->records.emplace_back(off + 8, len);
    off += 8 + len;
  }
  return l;
}

int crn_binlog_append(crn_binlog *l, const void *payload, uint32_t len) {
  if (!l || !l->write_mode) return -1;
  put_u32(l->buffer, len);
  put_u32(l->buffer, crn_crc32(payload, len));
  l->buffer.append(static_cast<const char *>(payload), len);
  if (l->buffer.size() >= 1u << 20) return crn_binlog_flush(l);
  return 0;
}

int crn_binlog_flush(crn_binlog *l) {
  if (!l || !l->write_mode) return -1;
  if (!l->buffer.empty()) {
    if (std::fwrite(l->buffer.data(), 1, l->buffer.size(), l->f) !=
        l->buffer.size())
      return -1;
    l->buffer.clear();
    std::fflush(l->f);
  }
  return 0;
}

uint64_t crn_binlog_num_records(const crn_binlog *l) {
  return l ? l->records.size() : 0;
}

int64_t crn_binlog_record(crn_binlog *l, uint64_t idx, void *out,
                          uint64_t cap) {
  if (!l || idx >= l->records.size()) return -1;
  auto [off, len] = l->records[idx];
  uint32_t stored_crc = get_u32(l->data.data() + off - 4);
  if (crn_crc32(l->data.data() + off, len) != stored_crc) return -2;
  uint64_t n = len < cap ? len : cap;
  std::memcpy(out, l->data.data() + off, n);
  return static_cast<int64_t>(len);
}

const char *crn_binlog_stream_name(const crn_binlog *l) {
  return l ? l->name.c_str() : "";
}

void crn_binlog_close(crn_binlog *l) {
  if (!l) return;
  if (l->write_mode) {
    crn_binlog_flush(l);
    std::fclose(l->f);
  }
  delete l;
}

uint32_t crn_version(void) { return 10000; }  // 1.0.0

}  // extern "C"
