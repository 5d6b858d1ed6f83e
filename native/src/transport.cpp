// Framed TCP transport for the scenario control plane.
//
// Native analog of the reference's raw-struct TCP star (controller listens
// on port 4444, every node connects: src/crts_controller.cpp:245-267 /
// :430-473, src/crts_cognitive_radio.cpp:533-553).  Where the reference
// memcpy's C structs straight onto the socket (layout-coupled, no framing),
// every message here is [u32 payload_len][u8 type][payload] with explicit
// little-endian framing, so Python and C++ peers interoperate and partial
// reads are handled.  recv uses poll() instead of the reference's
// busy-polling nonblocking loop (src/crts_controller.cpp:518-528).

#include "crn_runtime.h"

#include <cstdio>
#include <cstring>

#include <arpa/inet.h>
#include <errno.h>
#include <fcntl.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <sys/socket.h>
#include <sys/uio.h>
#include <unistd.h>

namespace {

// Read exactly n bytes; first_timeout_ms applies to the first byte, later
// bytes wait indefinitely (a started frame must finish).
// Returns n, 0 on clean close before any byte, -2 on timeout before any
// byte, -1 on error.
int64_t read_exact(int fd, void *buf, uint64_t n, int first_timeout_ms) {
  uint8_t *p = static_cast<uint8_t *>(buf);
  uint64_t got = 0;
  while (got < n) {
    struct pollfd pfd = {fd, POLLIN, 0};
    int timeout = got == 0 ? first_timeout_ms : -1;
    int pr = ::poll(&pfd, 1, timeout);
    if (pr == 0) return got == 0 ? -2 : -1;
    if (pr < 0) return -1;
    ssize_t r = ::recv(fd, p + got, n - got, 0);
    if (r == 0) return got == 0 ? 0 : -1;  // peer closed
    if (r < 0) return -1;
    got += static_cast<uint64_t>(r);
  }
  return static_cast<int64_t>(n);
}

int write_all(int fd, const void *buf, uint64_t n) {
  const uint8_t *p = static_cast<const uint8_t *>(buf);
  uint64_t sent = 0;
  while (sent < n) {
    ssize_t w = ::send(fd, p + sent, n - sent, MSG_NOSIGNAL);
    if (w <= 0) return -1;
    sent += static_cast<uint64_t>(w);
  }
  return 0;
}

}  // namespace

extern "C" {

int crn_tcp_listen(uint16_t port) {
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  struct sockaddr_in addr;
  std::memset(&addr, 0, sizeof(addr));
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(port);
  if (::bind(fd, reinterpret_cast<struct sockaddr *>(&addr), sizeof(addr)) <
          0 ||
      ::listen(fd, 64) < 0) {
    ::close(fd);
    return -1;
  }
  return fd;
}

int crn_tcp_accept(int server_fd, int timeout_ms) {
  struct pollfd pfd = {server_fd, POLLIN, 0};
  int pr = ::poll(&pfd, 1, timeout_ms);
  if (pr == 0) return -2;
  if (pr < 0) return -1;
  int fd = ::accept(server_fd, nullptr, nullptr);
  if (fd < 0) return -1;
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  // medium blocks are ~512 KB messages: default ~200 KB socket buffers make
  // a send block mid-message until the (busy) peer drains, serializing the
  // lockstep protocol
  int bufsz = 4 << 20;
  setsockopt(fd, SOL_SOCKET, SO_SNDBUF, &bufsz, sizeof(bufsz));
  setsockopt(fd, SOL_SOCKET, SO_RCVBUF, &bufsz, sizeof(bufsz));
  return fd;
}

int crn_tcp_connect(const char *host, uint16_t port, int timeout_ms) {
  struct addrinfo hints, *res = nullptr;
  std::memset(&hints, 0, sizeof(hints));
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  char portstr[8];
  std::snprintf(portstr, sizeof(portstr), "%u", static_cast<unsigned>(port));
  if (getaddrinfo(host, portstr, &hints, &res) != 0 || !res) return -1;
  int fd = ::socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd < 0) {
    freeaddrinfo(res);
    return -1;
  }
  // Non-blocking connect with poll timeout (a node pointed at an
  // unreachable controller must fail within timeout_ms, not the OS default).
  int flags = ::fcntl(fd, F_GETFL, 0);
  ::fcntl(fd, F_SETFL, flags | O_NONBLOCK);
  int rc = ::connect(fd, res->ai_addr, res->ai_addrlen);
  freeaddrinfo(res);
  if (rc < 0) {
    if (errno != EINPROGRESS) {
      ::close(fd);
      return -1;
    }
    struct pollfd pfd = {fd, POLLOUT, 0};
    int pr = ::poll(&pfd, 1, timeout_ms);
    if (pr <= 0) {
      ::close(fd);
      return pr == 0 ? -2 : -1;
    }
    int err = 0;
    socklen_t errlen = sizeof(err);
    if (getsockopt(fd, SOL_SOCKET, SO_ERROR, &err, &errlen) != 0 || err != 0) {
      ::close(fd);
      return -1;
    }
  }
  ::fcntl(fd, F_SETFL, flags);  // restore blocking mode
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  int bufsz = 4 << 20;  // see crn_tcp_accept
  setsockopt(fd, SOL_SOCKET, SO_SNDBUF, &bufsz, sizeof(bufsz));
  setsockopt(fd, SOL_SOCKET, SO_RCVBUF, &bufsz, sizeof(bufsz));
  return fd;
}

int crn_msg_send(int fd, uint8_t type, const void *payload, uint32_t len) {
  uint8_t hdr[5] = {static_cast<uint8_t>(len), static_cast<uint8_t>(len >> 8),
                    static_cast<uint8_t>(len >> 16),
                    static_cast<uint8_t>(len >> 24), type};
  if (write_all(fd, hdr, 5) != 0) return -1;
  if (len && write_all(fd, payload, len) != 0) return -1;
  return 0;
}

int crn_msg_send2(int fd, uint8_t type, const void *a, uint32_t na,
                  const void *b, uint32_t nb) {
  uint32_t len = na + nb;
  uint8_t hdr[5] = {static_cast<uint8_t>(len), static_cast<uint8_t>(len >> 8),
                    static_cast<uint8_t>(len >> 16),
                    static_cast<uint8_t>(len >> 24), type};
  struct iovec iov[3] = {{hdr, 5},
                         {const_cast<void *>(a), na},
                         {const_cast<void *>(b), nb}};
  struct msghdr msg = {};
  int idx = 0;
  uint64_t off = 0;  // bytes already sent within iov[idx]
  while (idx < 3) {
    if (iov[idx].iov_len == off) {  // segment done (or empty)
      ++idx;
      off = 0;
      continue;
    }
    struct iovec cur[3];
    int n = 0;
    cur[n].iov_base = static_cast<uint8_t *>(iov[idx].iov_base) + off;
    cur[n].iov_len = iov[idx].iov_len - off;
    ++n;
    for (int j = idx + 1; j < 3; ++j)
      if (iov[j].iov_len) cur[n++] = iov[j];
    msg.msg_iov = cur;
    msg.msg_iovlen = n;
    ssize_t w = ::sendmsg(fd, &msg, MSG_NOSIGNAL);
    if (w <= 0) return -1;
    uint64_t adv = static_cast<uint64_t>(w);
    while (adv && idx < 3) {
      uint64_t left = iov[idx].iov_len - off;
      if (adv < left) {
        off += adv;
        adv = 0;
      } else {
        adv -= left;
        ++idx;
        off = 0;
      }
    }
  }
  return 0;
}

int64_t crn_msg_recv(int fd, uint8_t *type, void *buf, uint64_t cap,
                     int timeout_ms) {
  uint8_t hdr[5];
  int64_t r = read_exact(fd, hdr, 5, timeout_ms);
  if (r == -2) return -2;  // timeout
  if (r == 0) return -3;   // clean close
  if (r != 5) return -1;
  uint32_t len = static_cast<uint32_t>(hdr[0]) |
                 (static_cast<uint32_t>(hdr[1]) << 8) |
                 (static_cast<uint32_t>(hdr[2]) << 16) |
                 (static_cast<uint32_t>(hdr[3]) << 24);
  *type = hdr[4];
  if (len > cap) {
    // Drain and discard the oversized payload so the stream stays framed
    // (leaving it unread would desync every subsequent recv).
    uint8_t sink[4096];
    uint64_t left = len;
    while (left) {
      uint64_t chunk = left < sizeof(sink) ? left : sizeof(sink);
      if (read_exact(fd, sink, chunk, -1) != static_cast<int64_t>(chunk))
        return -1;
      left -= chunk;
    }
    return -4;
  }
  if (len == 0) return 0;
  r = read_exact(fd, buf, len, -1);
  if (r != static_cast<int64_t>(len)) return -1;
  return static_cast<int64_t>(len);
}

void crn_tcp_close(int fd) {
  if (fd >= 0) ::close(fd);
}

}  // extern "C"
