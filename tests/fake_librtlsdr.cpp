// Fake librtlsdr ABI stub for exercising sdrreceiver_tpu/io/rtlusb.py
// without hardware. Implements the subset of the librtlsdr API the
// binding uses (same symbols the reference calls, /root/reference/
// jonti/sdr.cpp + sdrj.cpp). Two fake devices; rtlsdr_read_async
// synthesizes a phase-continuous complex tone at fs/8 as u8 IQ.
// Extra fake_* getters let tests inspect recorded settings.

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>

extern "C" {

typedef void (*rtlsdr_read_async_cb_t)(unsigned char *buf, uint32_t len,
                                       void *ctx);

struct fake_dev {
  int index = -1;
  bool open_ = false;
  uint32_t sample_rate = 0;
  uint32_t center_freq = 0;
  int gain_mode = -1;
  int gain = -1;
  int agc_mode = -1;
  int bias_tee = -1;
  std::atomic<bool> cancel{false};
  std::atomic<bool> running{false};
  uint64_t phase_n = 0;  // sample counter for phase continuity
};

static fake_dev g_devs[2];
static const char *g_names[2] = {"Fake RTL2838UHIDIR 0", "Fake RTL2838UHIDIR 1"};
static const char *g_serials[2] = {"00000001", "77777777"};

uint32_t rtlsdr_get_device_count(void) { return 2; }

const char *rtlsdr_get_device_name(uint32_t index) {
  return index < 2 ? g_names[index] : "";
}

int rtlsdr_get_device_usb_strings(uint32_t index, char *manufact,
                                  char *product, char *serial) {
  if (index >= 2) return -1;
  if (manufact) std::strcpy(manufact, "FakeCo");
  if (product) std::strcpy(product, "RTL2838UHIDIR");
  if (serial) std::strcpy(serial, g_serials[index]);
  return 0;
}

int rtlsdr_open(void **dev, uint32_t index) {
  if (index >= 2 || g_devs[index].open_) return -1;
  g_devs[index].index = (int)index;
  g_devs[index].open_ = true;
  g_devs[index].cancel.store(false);
  *dev = &g_devs[index];
  return 0;
}

int rtlsdr_close(void *dev) {
  if (!dev) return -1;
  ((fake_dev *)dev)->open_ = false;
  return 0;
}

int rtlsdr_set_sample_rate(void *dev, uint32_t rate) {
  ((fake_dev *)dev)->sample_rate = rate;
  return 0;
}
int rtlsdr_set_center_freq(void *dev, uint32_t freq) {
  ((fake_dev *)dev)->center_freq = freq;
  return 0;
}
int rtlsdr_set_tuner_gain_mode(void *dev, int mode) {
  ((fake_dev *)dev)->gain_mode = mode;
  return 0;
}
int rtlsdr_set_tuner_gain(void *dev, int gain) {
  ((fake_dev *)dev)->gain = gain;
  return 0;
}
int rtlsdr_set_agc_mode(void *dev, int on) {
  ((fake_dev *)dev)->agc_mode = on;
  return 0;
}
int rtlsdr_set_bias_tee(void *dev, int on) {
  ((fake_dev *)dev)->bias_tee = on;
  return 0;
}

int rtlsdr_get_tuner_gains(void *dev, int *gains) {
  (void)dev;
  static const int table[] = {0, 90, 167, 240, 290, 361, 420, 496};
  const int n = (int)(sizeof(table) / sizeof(table[0]));
  if (gains) std::memcpy(gains, table, sizeof(table));
  return n;
}

int rtlsdr_reset_buffer(void *dev) {
  (void)dev;
  return 0;
}

int rtlsdr_read_async(void *vdev, rtlsdr_read_async_cb_t cb, void *ctx,
                      uint32_t buf_num, uint32_t buf_len) {
  (void)buf_num;
  fake_dev *dev = (fake_dev *)vdev;
  if (!dev || !dev->open_ || buf_len == 0 || (buf_len & 1)) return -1;
  dev->running.store(true);
  unsigned char *buf = new unsigned char[buf_len];
  const double two_pi = 6.283185307179586476925286766559;
  while (!dev->cancel.load()) {
    const uint32_t n_samp = buf_len / 2;
    for (uint32_t i = 0; i < n_samp; ++i) {
      // tone at +fs/8, amplitude 50 around the 127 bias the LUT removes
      double ph = two_pi * ((double)((dev->phase_n + i) % 8)) / 8.0;
      buf[2 * i] = (unsigned char)(127.0 + 50.0 * std::cos(ph) + 0.5);
      buf[2 * i + 1] = (unsigned char)(127.0 + 50.0 * std::sin(ph) + 0.5);
    }
    dev->phase_n += n_samp;
    cb(buf, buf_len, ctx);
    // pace well above real-time but bounded, so drop-on-full is
    // exercised without busy-spinning a core during tests
    std::this_thread::sleep_for(std::chrono::milliseconds(1));
  }
  delete[] buf;
  dev->running.store(false);
  dev->cancel.store(false);
  return 0;
}

int rtlsdr_cancel_async(void *dev) {
  if (!dev) return -1;
  ((fake_dev *)dev)->cancel.store(true);
  return 0;
}

// ---- test-only inspection hooks (not part of the librtlsdr ABI) ----
int fake_get_sample_rate(int idx) { return (int)g_devs[idx].sample_rate; }
int fake_get_center_freq(int idx) { return (int)g_devs[idx].center_freq; }
int fake_get_gain_mode(int idx) { return g_devs[idx].gain_mode; }
int fake_get_gain(int idx) { return g_devs[idx].gain; }
int fake_get_agc_mode(int idx) { return g_devs[idx].agc_mode; }
int fake_get_bias_tee(int idx) { return g_devs[idx].bias_tee; }
int fake_get_open(int idx) { return g_devs[idx].open_ ? 1 : 0; }

}  // extern "C"
