// Native BioSemi BDF reader — the C++ data-loader counterpart of
// cerebra/data/bdf.py (same contract: signals in physical units, raw status
// words, labels). BDF: 256-byte main header, 256 bytes/channel of channel
// fields, then records of little-endian signed 24-bit samples
// (https://www.biosemi.com/faq/file_format.htm; reference ingest:
// ConvertToPth.py:69 via mne.io.read_raw_bdf).
//
// Two-call C API (dims first, then decode into caller buffers):
//   bdf_query(path, &n_channels, &n_samples, &sample_rate) -> 0 on success
//   bdf_read(path, signals[C*T], status[T], labels[C*17])  -> 0 on success
// Decode is parallelized over records with std::thread.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Header {
  int n_channels = 0;
  long n_records = 0;
  double record_dur = 1.0;
  int spr = 0;  // samples per record (uniform)
  long n_samples = 0;
  long data_offset = 0;
  std::vector<std::string> labels;
  // spec affine: physical = dig*gain + offset, gain possibly NEGATIVE for
  // inverted-polarity channels (dig_min > dig_max)
  std::vector<double> gain;    // (phys_max-phys_min)/(dig_max-dig_min)
  std::vector<double> offset;  // phys_min - dig_min*gain
  int status_channel = -1;
};

std::string field(const std::vector<char>& buf, size_t start, size_t len) {
  std::string s(buf.begin() + start, buf.begin() + start + len);
  // strip ascii whitespace on both ends (python .strip())
  size_t a = s.find_first_not_of(" \t\r\n\0");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n\0");
  return s.substr(a, b - a + 1);
}

int parse_header(FILE* f, Header* out) {
  std::vector<char> hdr(256);
  if (fread(hdr.data(), 1, 256, f) != 256) return 1;
  if ((unsigned char)hdr[0] != 0xFF || field(hdr, 1, 7) != "BIOSEMI") return 2;
  out->n_records = atol(field(hdr, 236, 8).c_str());
  out->record_dur = atof(field(hdr, 244, 8).c_str());
  out->n_channels = atoi(field(hdr, 252, 4).c_str());
  if (out->n_channels <= 0) return 3;
  const int C = out->n_channels;
  std::vector<char> ch(256 * (size_t)C);
  if (fread(ch.data(), 1, ch.size(), f) != ch.size()) return 4;

  auto ch_field = [&](int offset, int width, int i) {
    return field(ch, (size_t)offset * C + (size_t)i * width, width);
  };
  out->labels.resize(C);
  out->gain.resize(C);
  out->offset.resize(C);
  std::vector<long> n_samp(C);
  for (int i = 0; i < C; i++) {
    out->labels[i] = ch_field(0, 16, i);
    double phys_min = atof(ch_field(16 + 80 + 8, 8, i).c_str());
    double phys_max = atof(ch_field(16 + 80 + 8 + 8, 8, i).c_str());
    double dig_min = atof(ch_field(16 + 80 + 8 + 16, 8, i).c_str());
    double dig_max = atof(ch_field(16 + 80 + 8 + 24, 8, i).c_str());
    double denom = dig_max - dig_min;
    if (denom != 0.0) {
      out->gain[i] = (phys_max - phys_min) / denom;
      out->offset[i] = phys_min - dig_min * out->gain[i];
    } else {  // degenerate range: gain-1/no-offset fallback (bdf.py parity)
      out->gain[i] = 1.0;
      out->offset[i] = 0.0;
    }
    n_samp[i] = atol(ch_field(16 + 80 + 8 + 32 + 80, 8, i).c_str());
    std::string lab = out->labels[i];
    for (auto& c : lab) c = (char)tolower(c);
    if (out->status_channel < 0 && lab.rfind("status", 0) == 0)
      out->status_channel = i;
  }
  for (int i = 1; i < C; i++)
    if (n_samp[i] != n_samp[0]) return 5;  // variable rates unsupported
  out->spr = (int)n_samp[0];
  out->data_offset = 256 + 256L * C;

  long bytes_per_record = 3L * out->spr * C;
  if (bytes_per_record <= 0) return 7;  // malformed: spr 0 would SIGFPE below
  if (out->n_records <= 0) {  // unknown (-1): infer from file size
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    out->n_records = (size - out->data_offset) / bytes_per_record;
  }
  out->n_samples = out->n_records * (long)out->spr;
  return 0;
}

}  // namespace

extern "C" int bdf_query(const char* path, int* n_channels, long* n_samples,
                         double* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Header h;
  int rc = parse_header(f, &h);
  fclose(f);
  if (rc) return rc;
  *n_channels = h.n_channels;
  *n_samples = h.n_samples;
  *sample_rate = h.spr / h.record_dur;
  return 0;
}

extern "C" int bdf_read(const char* path, float* signals, int32_t* status,
                        char* labels /* C*17, NUL-terminated */) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Header h;
  int rc = parse_header(f, &h);
  if (rc) { fclose(f); return rc; }
  const int C = h.n_channels;
  const int spr = h.spr;
  const long R = h.n_records;
  const long T = h.n_samples;

  fseek(f, h.data_offset, SEEK_SET);
  // a corrupt header can declare terabytes; bad_alloc must become an error
  // code, not a std::terminate() across the extern "C" boundary (the Python
  // caller falls back to the numpy reader on nonzero rc)
  std::vector<uint8_t> raw;
  try {
    raw.resize(3L * spr * C * R);
  } catch (const std::bad_alloc&) {
    fclose(f);
    return 8;
  }
  size_t got = fread(raw.data(), 1, raw.size(), f);
  fclose(f);
  if (got != raw.size()) return 6;

  for (int i = 0; i < C; i++) {
    strncpy(labels + 17L * i, h.labels[i].c_str(), 16);
    labels[17L * i + 16] = '\0';
  }
  if (status) memset(status, 0, sizeof(int32_t) * (size_t)T);

  unsigned n_threads = std::thread::hardware_concurrency();
  if (n_threads == 0) n_threads = 1;
  if ((long)n_threads > R) n_threads = (unsigned)R;
  std::vector<std::thread> pool;
  for (unsigned w = 0; w < n_threads; w++) {
    pool.emplace_back([&, w]() {
      for (long r = w; r < R; r += n_threads) {
        const uint8_t* rec = raw.data() + 3L * spr * C * r;
        for (int c = 0; c < C; c++) {
          const uint8_t* p = rec + 3L * spr * c;
          float* dst = signals + (size_t)c * T + (size_t)r * spr;
          const double g = h.gain[c];
          const double off = h.offset[c];
          const bool is_status = (c == h.status_channel);
          int32_t* sdst =
              (is_status && status) ? status + (size_t)r * spr : nullptr;
          for (int s = 0; s < spr; s++) {
            int32_t v = (int32_t)p[3 * s] | ((int32_t)p[3 * s + 1] << 8) |
                        ((int32_t)p[3 * s + 2] << 16);
            if (v >= (1 << 23)) v -= (1 << 24);
            dst[s] = (float)(v * g + off);
            if (sdst) sdst[s] = v & 0xFFFF;
          }
        }
      }
    });
  }
  for (auto& t : pool) t.join();
  return 0;
}
