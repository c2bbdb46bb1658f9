// Native host-path kernels for mod_extraction_tpu.
//
// The reference leans on native code for its host data path (pedalboard's
// JUCE C++ DSP and torchaudio's C++ IO — SURVEY.md §2.3); here the
// TPU-side DSP moved into XLA/Pallas, and this library covers what
// remains on the host: WAV chunk decoding and the windowed-energy
// silence scan that run per training example in the input pipeline
// (mod_extraction_tpu/data/datasets.py, data/wav.py).  Loaded via ctypes
// (mod_extraction_tpu/native.py) with a pure-numpy fallback.
//
// Build: g++ -O3 -shared -fPIC -o modx_native.so modx_native.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

struct WavMeta {
  int32_t sample_rate;
  int32_t num_channels;
  int32_t bits_per_sample;
  int32_t audio_format;  // 1 = PCM, 3 = IEEE float
  int64_t num_frames;
  int64_t data_offset;
  int32_t block_align;
};

// Parse the RIFF header. Returns 0 on success, negative on error.
static int parse_header(FILE* f, WavMeta* meta) {
  uint8_t riff[12];
  if (fread(riff, 1, 12, f) != 12 || memcmp(riff, "RIFF", 4) != 0 ||
      memcmp(riff + 8, "WAVE", 4) != 0)
    return -1;
  bool have_fmt = false;
  uint16_t audio_format = 0, n_ch = 0, block_align = 0, bits = 0;
  uint32_t sr = 0;
  for (;;) {
    uint8_t hdr[8];
    if (fread(hdr, 1, 8, f) != 8) return -2;
    uint32_t size;
    memcpy(&size, hdr + 4, 4);
    if (memcmp(hdr, "fmt ", 4) == 0) {
      uint8_t body[64];
      uint32_t n = size < sizeof(body) ? size : (uint32_t)sizeof(body);
      if (fread(body, 1, n, f) != n) return -3;
      if (size > n && fseek(f, (long)(size - n), SEEK_CUR) != 0) return -3;
      memcpy(&audio_format, body + 0, 2);
      memcpy(&n_ch, body + 2, 2);
      memcpy(&sr, body + 4, 4);
      memcpy(&block_align, body + 12, 2);
      memcpy(&bits, body + 14, 2);
      if (audio_format == 0xFFFE && size >= 40)  // WAVE_FORMAT_EXTENSIBLE
        memcpy(&audio_format, body + 24, 2);
      have_fmt = true;
    } else if (memcmp(hdr, "data", 4) == 0) {
      if (!have_fmt) return -4;
      if (block_align == 0) block_align = n_ch * (bits / 8);
      if (block_align == 0) return -5;
      meta->sample_rate = (int32_t)sr;
      meta->num_channels = n_ch;
      meta->bits_per_sample = bits;
      meta->audio_format = audio_format;
      meta->num_frames = (int64_t)(size / block_align);
      meta->data_offset = ftell(f);
      meta->block_align = block_align;
      return 0;
    } else {
      if (fseek(f, (long)(size + (size & 1)), SEEK_CUR) != 0) return -6;
    }
  }
}

int modx_wav_info(const char* path, WavMeta* meta) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  int rc = parse_header(f, meta);
  fclose(f);
  return rc;
}

// Decode `num_frames` frames starting at `frame_offset` into `out`,
// planar (C, T) float32 in [-1, 1].  Returns frames decoded, or <0.
// `meta_out` (optional) receives the parsed header, so callers get
// sample rate + channel count from the same file open.
int64_t modx_wav_read_chunk(const char* path, int64_t frame_offset,
                            int64_t num_frames, float* out,
                            WavMeta* meta_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  WavMeta m;
  int rc = parse_header(f, &m);
  if (rc != 0) {
    fclose(f);
    return rc;
  }
  if (meta_out) *meta_out = m;
  if (frame_offset < 0) frame_offset = 0;
  if (num_frames < 0 || frame_offset + num_frames > m.num_frames)
    num_frames = m.num_frames - frame_offset;
  if (num_frames <= 0) {
    fclose(f);
    return 0;
  }
  if (fseek(f, (long)(m.data_offset + frame_offset * m.block_align),
            SEEK_SET) != 0) {
    fclose(f);
    return -11;
  }
  const int64_t c = m.num_channels, t = num_frames;
  const int64_t nbytes = t * m.block_align;
  uint8_t* raw = new uint8_t[nbytes];
  int64_t got = (int64_t)fread(raw, 1, (size_t)nbytes, f);
  fclose(f);
  int64_t frames = got / m.block_align;

  const int bytes_per = m.bits_per_sample / 8;
  // interleaved -> planar with per-format scaling
  if (m.audio_format == 3 && m.bits_per_sample == 32) {
    const float* s = (const float*)raw;
    for (int64_t i = 0; i < frames; ++i)
      for (int64_t ch = 0; ch < c; ++ch) out[ch * t + i] = s[i * c + ch];
  } else if (m.audio_format == 3 && m.bits_per_sample == 64) {
    const double* s = (const double*)raw;
    for (int64_t i = 0; i < frames; ++i)
      for (int64_t ch = 0; ch < c; ++ch)
        out[ch * t + i] = (float)s[i * c + ch];
  } else if (m.bits_per_sample == 16 && c == 1) {
    // mono PCM16 (the common training-data case): contiguous, SIMD-friendly
    const int16_t* s = (const int16_t*)raw;
    const float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < frames; ++i) out[i] = s[i] * k;
  } else if (m.bits_per_sample == 16) {
    const int16_t* s = (const int16_t*)raw;
    const float k = 1.0f / 32768.0f;
    for (int64_t ch = 0; ch < c; ++ch) {
      float* o = out + ch * t;
      const int16_t* si = s + ch;
      for (int64_t i = 0; i < frames; ++i) o[i] = si[i * c] * k;
    }
  } else if (m.bits_per_sample == 32) {
    const int32_t* s = (const int32_t*)raw;
    const float k = 1.0f / 2147483648.0f;
    for (int64_t i = 0; i < frames; ++i)
      for (int64_t ch = 0; ch < c; ++ch) out[ch * t + i] = s[i * c + ch] * k;
  } else if (m.bits_per_sample == 24) {
    const float k = 1.0f / 8388608.0f;
    for (int64_t i = 0; i < frames; ++i)
      for (int64_t ch = 0; ch < c; ++ch) {
        const uint8_t* p = raw + (i * c + ch) * 3;
        int32_t v = (int32_t)p[0] | ((int32_t)p[1] << 8) | ((int32_t)p[2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        out[ch * t + i] = v * k;
      }
  } else if (m.bits_per_sample == 8) {
    const float k = 1.0f / 128.0f;
    for (int64_t i = 0; i < frames; ++i)
      for (int64_t ch = 0; ch < c; ++ch)
        out[ch * t + i] = ((float)raw[(i * c + ch) * bytes_per] - 128.0f) * k;
  } else {
    delete[] raw;
    return -12;
  }
  delete[] raw;
  return frames;
}

// Windowed-mean-energy silence test over planar (C, T) float32.
// Returns 1 if any length-`window` window (stride `hop`) in any channel
// has mean energy below `threshold`, else 0.  Mirrors
// RandomAudioChunkDataset.check_for_silence (reference datasets.py:162-169).
int modx_silence_scan(const float* x, int64_t c, int64_t t, int64_t window,
                      int64_t hop, double threshold) {
  if (window < 1 || window > t) return 0;
  if (hop < 1) hop = 1;
  const double limit = threshold * (double)window;
  for (int64_t ch = 0; ch < c; ++ch) {
    const float* s = x + ch * t;
    double acc = 0.0;
    for (int64_t i = 0; i < window; ++i) acc += (double)s[i] * s[i];
    if (acc < limit) return 1;
    // running update per hop: subtract the old hop, add the new hop
    for (int64_t start = hop; start + window <= t; start += hop) {
      for (int64_t i = start - hop; i < start; ++i)
        acc -= (double)s[i] * s[i];
      for (int64_t i = start + window - hop; i < start + window; ++i)
        acc += (double)s[i] * s[i];
      if (acc < limit) return 1;
    }
  }
  return 0;
}

}  // extern "C"
