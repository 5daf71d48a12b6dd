/* bvsp_client — native BVSP/1 streaming client (no Python, no JAX).
 *
 * A deployment box (SIP gateway, embedded recorder, ingest shim) should not
 * need the Python stack to talk to a bvsc_tpu serving daemon
 * (bvsc_tpu/serve/daemon.py).  This is the C counterpart of
 * bvsc_tpu/serve/client.py: one process == one stream, speaking the framed
 * little-endian BVSP/1 wire protocol (bvsc_tpu/serve/protocol.py).
 *
 * Usage:
 *   bvsp_client HOST PORT resynth BITRATE   < in.f32   > out.f32
 *   bvsp_client HOST PORT encode  BITRATE   < in.f32   > out.bvspf
 *   bvsp_client HOST PORT decode  [BITRATE] < in.bvspf > out.f32
 *
 * encode-ent / decode-ent negotiate adaptive entropy-coded code payloads
 * (protocol FLAG_ENTROPY; bvsc_tpu/serve/entropy_wire.py): encode-ent
 * emits the daemon's CODES_ENT_OUT frames verbatim (payload savings are
 * model-dependent: ~75 % on the KLD-collapsed demo ckpt, 21-33 % on the
 * shipped r3 ckpt at 3-5.5 kbps, NEGATIVE at 1.38 kbps/8-frame blocks —
 * docs/artifacts/entropy_wire_stats.json),
 * decode-ent forwards CODES_ENT frames.  A recorded
 * encode-ent .bvspf replays into decode-ent after retyping 0x84 -> 0x07
 * (the same CODES_OUT -> CODES retype the raw pipeline needs); both
 * stream coders start from the same initial state, so the payloads decode
 * identically.  BVSP_ENT_BLOCK (env, default 8) sets the server's
 * encode-side frames-per-message aggregation.
 *
 * I/O contract (all little-endian, matching the wire):
 *   - f32 streams are raw float32 samples at the codec rate (22.05 kHz for
 *     the shipped configs); PCM conversion is the caller's concern.
 *   - .bvspf streams are BVSP frames verbatim: u8 type, u32 payload length,
 *     payload.  encode mode emits the daemon's CODES_OUT frames (one 11.6 ms
 *     packet each, first-k-priority packed bits, bvsc_tpu/native/bitpack.c);
 *     decode mode forwards CODES and LOST frames from stdin (LOST = ask the
 *     server to conceal n frames from the model prior — PLC).
 *   - decode BITRATE is the concealment bit allocation; omitted or "nan"
 *     means all prior bits (protocol NaN).
 *
 * Single-threaded poll() loop with a non-blocking socket and an outbound
 * queue: stdin is only consumed while the queue is shallow, so a slow
 * server cannot wedge the client against the daemon's send timeouts (the
 * daemon kills peers that stall its writes — serve/daemon.py hardening).
 *
 * Exit codes: 0 ok; 1 usage/connect failure; 2 server ERROR; 3 protocol
 * violation / premature close / stall by the server; 4 malformed local
 * input.  A close is only "clean" when the client had sent CLOSE and
 * nothing remained queued — anything else exits non-zero, so
 * `bvsp_client ... > out.f32 && publish` can never ship truncated audio.
 *
 * BVSP_TIMEOUT (env, seconds, default 300): inactivity bound for connect
 * and for the poll loop; a wedged daemon fails the client instead of
 * hanging it.
 *
 * Build (also done on demand by bvsc_tpu/serve/native_client.py):
 *   cc -O2 -o bvsp_client bvsp_client.c
 */

#include <errno.h>
#include <math.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <strings.h>
#include <sys/socket.h>
#include <sys/types.h>
#include <unistd.h>
#include <fcntl.h>

/* ---- protocol constants (bvsc_tpu/serve/protocol.py) ---------------- */

#define MSG_HELLO 0x01
#define MSG_AUDIO 0x02
#define MSG_CODES 0x03
#define MSG_LOST 0x04
#define MSG_SET_BITRATE 0x05
#define MSG_CLOSE 0x06
#define MSG_CODES_ENT 0x07
#define MSG_OPENED 0x81
#define MSG_CODES_OUT 0x82
#define MSG_AUDIO_OUT 0x83
#define MSG_CODES_ENT_OUT 0x84
#define MSG_ERROR 0xFF

#define MODE_RESYNTH 0
#define MODE_ENCODE 1
#define MODE_DECODE 2

#define FLAG_ENTROPY 0x01

#define HDR_SIZE 5       /* u8 type + u32 len */
#define HELLO_SIZE 10    /* "BVSP" + u8 ver + u8 mode + f32 bitrate */
#define HELLO_EXT_SIZE 2 /* u8 flags + u8 entropy_block */
#define OPENED_SIZE 6    /* u16 sid + u16 z_dim + u16 hop */
#define OPENED_EXT_SIZE 1 /* u8 accepted flags */

/* per-type payload bounds for SERVER->client frames (protocol MAX_PAYLOAD) */
static long max_payload(uint8_t t) {
  switch (t) {
    case MSG_OPENED:        return OPENED_SIZE + OPENED_EXT_SIZE;
    case MSG_CODES_OUT:     return 1L << 20;
    case MSG_AUDIO_OUT:     return 4L << 20;
    case MSG_CODES_ENT_OUT: return 1L << 20;
    case MSG_ERROR:         return 4096;
    default:                return -1;
  }
}

/* bounds for frames we forward from local .bvspf input in decode mode;
   entropy frames only after a negotiated -ent session (stateful payloads
   would be rejected by a plain server anyway) */
static long max_payload_fwd(uint8_t t, int entropy) {
  switch (t) {
    case MSG_CODES: return 1L << 20;
    case MSG_LOST:  return 2;
    case MSG_CODES_ENT: return entropy ? (1L << 20) : -1;
    default:        return -1;
  }
}

/* one AUDIO message carries at most this many f32 samples */
#define MAX_AUDIO_SAMPLES (1L << 20)
/* stop consuming stdin while more than this many bytes are queued outbound */
#define OUTQ_SOFT_CAP (1L << 22)
#define STDIN_CHUNK 65536

/* ---- little-endian serialization (wire format is LE, host-agnostic) -- */

static void put_u32le(uint8_t *p, uint32_t v) {
  p[0] = (uint8_t)v; p[1] = (uint8_t)(v >> 8);
  p[2] = (uint8_t)(v >> 16); p[3] = (uint8_t)(v >> 24);
}
static uint32_t get_u32le(const uint8_t *p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) |
         ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
}
static void put_f32le(uint8_t *p, float f) {
  uint32_t v; memcpy(&v, &f, 4); put_u32le(p, v);
}

/* ---- growable byte queue --------------------------------------------- */

typedef struct {
  uint8_t *data;
  size_t head, len, cap;
} buf_t;

static void buf_push(buf_t *b, const void *src, size_t n) {
  if (b->head && b->head + b->len + n > b->cap) {  /* compact */
    memmove(b->data, b->data + b->head, b->len);
    b->head = 0;
  }
  if (b->len + n > b->cap) {
    size_t cap = b->cap ? b->cap : 4096;
    while (cap < b->len + n) cap *= 2;
    b->data = realloc(b->data, cap);
    if (!b->data) { perror("realloc"); exit(1); }
    b->cap = cap;
  }
  memcpy(b->data + b->head + b->len, src, n);
  b->len += n;
}
static void buf_consume(buf_t *b, size_t n) {
  b->head += n; b->len -= n;
  if (!b->len) b->head = 0;
}
static uint8_t *buf_ptr(buf_t *b) { return b->data + b->head; }

/* ---- helpers ---------------------------------------------------------- */

static void queue_frame(buf_t *out, uint8_t type, const void *payload,
                        uint32_t len) {
  uint8_t hdr[HDR_SIZE];
  hdr[0] = type;
  put_u32le(hdr + 1, len);
  buf_push(out, hdr, HDR_SIZE);
  if (len) buf_push(out, payload, len);
}

static int write_all(int fd, const void *p, size_t n) {
  const uint8_t *s = p;
  while (n) {
    ssize_t w = write(fd, s, n);
    if (w < 0) {
      if (errno == EINTR) continue;
      return -1;
    }
    s += w; n -= (size_t)w;
  }
  return 0;
}

static int timeout_ms(void) {
  const char *s = getenv("BVSP_TIMEOUT");
  double t = s ? strtod(s, NULL) : 300.0;
  if (t <= 0) t = 300.0;
  if (t > 86400.0) t = 86400.0;
  return (int)(t * 1000.0);
}

/* non-blocking connect with the inactivity timeout */
static int connect_one(struct addrinfo *ai, int tmo_ms) {
  int fd = socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
  if (fd < 0) return -1;
  if (fcntl(fd, F_SETFL, O_NONBLOCK) < 0) { close(fd); return -1; }
  int rc = connect(fd, ai->ai_addr, ai->ai_addrlen);
  if (rc < 0 && errno == EINPROGRESS) {
    struct pollfd p = {.fd = fd, .events = POLLOUT};
    rc = poll(&p, 1, tmo_ms);
    if (rc > 0) {
      int err = 0;
      socklen_t len = sizeof err;
      if (getsockopt(fd, SOL_SOCKET, SO_ERROR, &err, &len) == 0 && !err)
        rc = 0;
      else
        rc = -1;
    } else {
      rc = -1; /* timeout or poll error */
    }
  }
  if (rc != 0) { close(fd); return -1; }
  return fd;
}

static int connect_to(const char *host, const char *port) {
  struct addrinfo hints, *res, *ai;
  memset(&hints, 0, sizeof hints);
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  int rc = getaddrinfo(host, port, &hints, &res);
  if (rc) {
    fprintf(stderr, "bvsp_client: %s:%s: %s\n", host, port, gai_strerror(rc));
    return -1;
  }
  int fd = -1;
  int tmo = timeout_ms();
  for (ai = res; ai; ai = ai->ai_next)
    if ((fd = connect_one(ai, tmo)) >= 0) break;
  freeaddrinfo(res);
  if (fd < 0) {
    fprintf(stderr, "bvsp_client: cannot connect to %s:%s\n", host, port);
    return -1;
  }
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof one);
  return fd;
}

/* ---- main ------------------------------------------------------------- */

int main(int argc, char **argv) {
  if (argc < 4 || argc > 5) {
    fprintf(stderr,
            "usage: bvsp_client HOST PORT "
            "resynth|encode|decode|encode-ent|decode-ent [BITRATE]\n");
    return 1;
  }
  int mode, entropy = 0;
  if (!strcmp(argv[3], "resynth")) mode = MODE_RESYNTH;
  else if (!strcmp(argv[3], "encode")) mode = MODE_ENCODE;
  else if (!strcmp(argv[3], "decode")) mode = MODE_DECODE;
  else if (!strcmp(argv[3], "encode-ent")) { mode = MODE_ENCODE; entropy = 1; }
  else if (!strcmp(argv[3], "decode-ent")) { mode = MODE_DECODE; entropy = 1; }
  else {
    fprintf(stderr, "bvsp_client: unknown mode '%s'\n", argv[3]);
    return 1;
  }
  int ent_block = 8; /* server-side encode aggregation (frames/message) */
  {
    const char *eb = getenv("BVSP_ENT_BLOCK");
    if (eb && *eb) {
      long v = strtol(eb, NULL, 10);
      if (v < 1 || v > 255) {
        fprintf(stderr, "bvsp_client: BVSP_ENT_BLOCK must be in [1,255]\n");
        return 1;
      }
      ent_block = (int)v;
    }
  }
  float bitrate = NAN;
  if (argc == 5 && strcasecmp(argv[4], "nan") != 0)
    bitrate = strtof(argv[4], NULL);
  if (mode != MODE_DECODE && isnan(bitrate)) {
    fprintf(stderr, "bvsp_client: %s mode needs a BITRATE\n", argv[3]);
    return 1;
  }

  int sock = connect_to(argv[1], argv[2]);
  if (sock < 0) return 1;

  buf_t outq = {0}, inq = {0}, stdin_buf = {0};

  /* HELLO (entropy sessions append the 2-byte flags extension) */
  {
    uint8_t hello[HELLO_SIZE + HELLO_EXT_SIZE];
    memcpy(hello, "BVSP", 4);
    hello[4] = 1; /* version */
    hello[5] = (uint8_t)mode;
    put_f32le(hello + 6, bitrate);
    uint32_t hlen = HELLO_SIZE;
    if (entropy) {
      hello[HELLO_SIZE] = FLAG_ENTROPY;
      hello[HELLO_SIZE + 1] = (uint8_t)ent_block;
      hlen += HELLO_EXT_SIZE;
    }
    queue_frame(&outq, MSG_HELLO, hello, hlen);
  }

  if (fcntl(sock, F_SETFL, O_NONBLOCK) < 0) { perror("fcntl"); return 1; }

  int stdin_open = 1, close_sent = 0, opened = 0;
  const int tmo = timeout_ms();

  for (;;) {
    struct pollfd fds[2];
    int nfds = 0;
    int sock_idx = nfds;
    fds[nfds].fd = sock;
    fds[nfds].events = POLLIN | (outq.len ? POLLOUT : 0);
    ++nfds;
    int stdin_idx = -1;
    /* only consume local input after OPENED, and while the queue is
       shallow (backpressure towards the producer, not the daemon) */
    if (stdin_open && opened && outq.len < OUTQ_SOFT_CAP) {
      stdin_idx = nfds;
      fds[nfds].fd = STDIN_FILENO;
      fds[nfds].events = POLLIN;
      ++nfds;
    }
    int nev = poll(fds, (nfds_t)nfds, tmo);
    if (nev < 0) {
      if (errno == EINTR) continue;
      perror("poll");
      return 3;
    }
    if (nev == 0) {
      fprintf(stderr,
              "bvsp_client: no server activity for %d s, giving up\n",
              tmo / 1000);
      return 3;
    }

    /* ---- socket writable: flush outbound queue ---- */
    if (fds[sock_idx].revents & POLLOUT) {
      while (outq.len) {
        ssize_t w = send(sock, buf_ptr(&outq), outq.len, MSG_NOSIGNAL);
        if (w < 0) {
          if (errno == EAGAIN || errno == EWOULDBLOCK) break;
          if (errno == EINTR) continue;
          /* peer gone: fall through to read side to pick up ERROR/EOF */
          break;
        }
        buf_consume(&outq, (size_t)w);
      }
    }

    /* ---- socket readable: parse frames ---- */
    if (fds[sock_idx].revents & (POLLIN | POLLHUP | POLLERR)) {
      uint8_t tmp[65536];
      int eof = 0, recv_err = 0;
      for (;;) {
        ssize_t r = recv(sock, tmp, sizeof tmp, 0);
        if (r > 0) { buf_push(&inq, tmp, (size_t)r); continue; }
        if (r == 0) { eof = 1; break; }
        if (errno == EAGAIN || errno == EWOULDBLOCK) break;
        if (errno == EINTR) continue;
        recv_err = errno;
        eof = 1;
        break;
      }
      /* drain complete frames */
      for (;;) {
        if (inq.len < HDR_SIZE) break;
        uint8_t type = buf_ptr(&inq)[0];
        uint32_t len = get_u32le(buf_ptr(&inq) + 1);
        long lim = max_payload(type);
        if (lim < 0) {
          fprintf(stderr,
                  "bvsp_client: unexpected message type 0x%02x\n", type);
          return 3;
        }
        if ((long)len > lim) {
          fprintf(stderr, "bvsp_client: oversized payload (%u B)\n", len);
          return 3;
        }
        if (inq.len < HDR_SIZE + (size_t)len) break;
        const uint8_t *payload = buf_ptr(&inq) + HDR_SIZE;
        if (type == MSG_ERROR) {
          fprintf(stderr, "bvsp_client: server error: %.*s\n", (int)len,
                  (const char *)payload);
          return 2;
        } else if (type == MSG_OPENED) {
          if (opened ||
              (len != OPENED_SIZE && len != OPENED_SIZE + OPENED_EXT_SIZE)) {
            fprintf(stderr, "bvsp_client: bad OPENED\n");
            return 3;
          }
          uint8_t got_flags =
              (len > OPENED_SIZE) ? payload[OPENED_SIZE] : 0;
          if (entropy && !(got_flags & FLAG_ENTROPY)) {
            fprintf(stderr,
                    "bvsp_client: server did not accept entropy coding\n");
            return 3;
          }
          opened = 1;
        } else if (type == MSG_AUDIO_OUT) {
          if (mode == MODE_ENCODE || len % 4) {
            fprintf(stderr, "bvsp_client: unexpected AUDIO_OUT\n");
            return 3;
          }
          if (write_all(STDOUT_FILENO, payload, len) < 0) {
            perror("write");
            return 1;
          }
        } else if (type == MSG_CODES_OUT || type == MSG_CODES_ENT_OUT) {
          if (mode != MODE_ENCODE ||
              (type == MSG_CODES_ENT_OUT && !entropy)) {
            fprintf(stderr, "bvsp_client: unexpected CODES%s_OUT\n",
                    type == MSG_CODES_ENT_OUT ? "_ENT" : "");
            return 3;
          }
          /* emit the frame verbatim (.bvspf = wire framing) */
          uint8_t hdr[HDR_SIZE];
          hdr[0] = type;
          put_u32le(hdr + 1, len);
          if (write_all(STDOUT_FILENO, hdr, HDR_SIZE) < 0 ||
              write_all(STDOUT_FILENO, payload, len) < 0) {
            perror("write");
            return 1;
          }
        }
        buf_consume(&inq, HDR_SIZE + (size_t)len);
      }
      if (eof) {
        /* a close is clean ONLY at a frame boundary, after our CLOSE was
           sent and fully flushed — anything else means the server reset,
           stalled out, or quit early, and the output is truncated */
        if (recv_err) {
          fprintf(stderr, "bvsp_client: connection error: %s\n",
                  strerror(recv_err));
          return 3;
        }
        if (inq.len) {
          fprintf(stderr, "bvsp_client: connection closed mid-message\n");
          return 3;
        }
        if (!close_sent || outq.len) {
          fprintf(stderr,
                  "bvsp_client: server closed before the stream finished "
                  "(output may be truncated)\n");
          return 3;
        }
        break; /* clean end of stream */
      }
    }

    /* ---- stdin readable: stage local input ---- */
    if (stdin_idx >= 0 && (fds[stdin_idx].revents & (POLLIN | POLLHUP))) {
      uint8_t tmp[STDIN_CHUNK];
      ssize_t r = read(STDIN_FILENO, tmp, sizeof tmp);
      if (r < 0 && errno != EINTR) { perror("read"); return 1; }
      if (r > 0) {
        buf_push(&stdin_buf, tmp, (size_t)r);
        if (mode == MODE_DECODE) {
          /* forward complete CODES/LOST frames verbatim */
          for (;;) {
            if (stdin_buf.len < HDR_SIZE) break;
            uint8_t type = buf_ptr(&stdin_buf)[0];
            uint32_t len = get_u32le(buf_ptr(&stdin_buf) + 1);
            long lim = max_payload_fwd(type, entropy);
            if (lim < 0) {
              fprintf(stderr,
                      "bvsp_client: input frame type 0x%02x not allowed in "
                      "decode mode\n", type);
              return 4;
            }
            if ((long)len > lim) {
              fprintf(stderr, "bvsp_client: oversized input frame\n");
              return 4;
            }
            if (stdin_buf.len < HDR_SIZE + (size_t)len) break;
            queue_frame(&outq, type, buf_ptr(&stdin_buf) + HDR_SIZE, len);
            buf_consume(&stdin_buf, HDR_SIZE + (size_t)len);
          }
        } else {
          /* whole samples only; carry the remainder bytes */
          size_t nsamp = stdin_buf.len / 4;
          while (nsamp) {
            size_t take = nsamp > (size_t)MAX_AUDIO_SAMPLES
                              ? (size_t)MAX_AUDIO_SAMPLES : nsamp;
            queue_frame(&outq, MSG_AUDIO, buf_ptr(&stdin_buf),
                        (uint32_t)(take * 4));
            buf_consume(&stdin_buf, take * 4);
            nsamp -= take;
          }
        }
      }
      if (r == 0) {
        stdin_open = 0;
        if (mode != MODE_DECODE && stdin_buf.len) {
          fprintf(stderr,
                  "bvsp_client: trailing %zu bytes are not a whole float32 "
                  "sample\n", stdin_buf.len);
          return 4;
        }
        if (mode == MODE_DECODE && stdin_buf.len) {
          fprintf(stderr, "bvsp_client: truncated input frame\n");
          return 4;
        }
      }
    }

    /* half-close once all local input has been staged */
    if (!stdin_open && !close_sent) {
      queue_frame(&outq, MSG_CLOSE, NULL, 0);
      close_sent = 1;
    }
  }

  close(sock);
  free(outq.data);
  free(inq.data);
  free(stdin_buf.data);
  return 0;
}
