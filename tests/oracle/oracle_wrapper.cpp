// Test-only extern "C" wrapper exposing the REFERENCE's own compiled DSP
// code (/root/reference) as a golden oracle for the JAX framework
// (VERDICT r1 item 3: the oracle must be the reference's code, not a
// builder-authored model).
//
// Compiled sources: gnuradio/firfilter.cpp, jonti/dsp.cpp,
// halfbanddecimator.cpp, oscillator.cpp — the reference's pure-DSP layer —
// with a minimal QVector shim (shim/).  The chain harness below COMPOSES
// those objects exactly the way vfo.cpp does (citations inline); it adds no
// DSP of its own.

#include <cmath>
#include <complex>
#include <cstring>
#include <vector>

#include "gnuradio/firfilter.h"
// NOTE: jonti/dsp.h has a broken include guard (it closes at the top of the
// file, /root/reference/jonti/dsp.h:24-27), so it must be included exactly
// once — halfbanddecimator.h pulls it in.
#include "halfbanddecimator.h"
#include "oscillator.h"

extern "C" {

// ---- firfilter::low_pass (gnuradio/firfilter.cpp:64-106) -----------------
int ref_low_pass(double gain, double fs, double cutoff, double transition,
                 int window_type, double beta, float* out, int maxn) {
  firfilter filt;
  QVector<float> taps;
  try {
    taps = filt.low_pass(gain, fs, cutoff, transition,
                         static_cast<firfilter::win_type>(window_type), beta);
  } catch (...) {
    return -1;
  }
  if (taps.length() > maxn) return -2;
  for (int i = 0; i < taps.length(); i++) out[i] = taps[i];
  return taps.length();
}

// ---- FIRHilbert coefficients (jonti/dsp.cpp:184-217) ----------------------
// points[] are stored REVERSED (points[i] = coeff[len-1-i], dsp.cpp:215);
// this returns them in natural coefficient order.
int ref_hilbert_taps(int len, int fs, float* out) {
  FIRHilbert h(len, fs);
  for (int i = 0; i < len; i++) out[i] = h.points[len - 1 - i];
  return len;
}

// ---- Oscillator wavetable phasors (oscillator.cpp:4-50) -------------------
void* ref_osc_new(double fs, double freq) { return new Oscillator(fs, freq); }
void ref_osc_run(void* o, int n, float* re, float* im) {
  Oscillator* osc = static_cast<Oscillator*>(o);
  for (int i = 0; i < n; i++) {
    re[i] = osc->_vector.real();
    im[i] = osc->_vector.imag();
    osc->tick();
  }
}
void ref_osc_free(void* o) { delete static_cast<Oscillator*>(o); }

// ---- streaming HalfBandDecimator (halfbanddecimator.cpp:43-72) ------------
void* ref_hbd_new(int taps, int inlen) {
  return new HalfBandDecimator(taps, inlen);
}
// in: n complex samples (planar); out: n/2 complex samples.  State (FIR
// queues) carries across calls exactly as in the reference.
void ref_hbd_decimate(void* h, const float* in_re, const float* in_im, int n,
                      float* out_re, float* out_im) {
  HalfBandDecimator* d = static_cast<HalfBandDecimator*>(h);
  std::vector<cpx_typef> in(static_cast<size_t>(n));
  std::vector<cpx_typef> out(static_cast<size_t>(n / 2));
  for (int i = 0; i < n; i++) in[i] = cpx_typef(in_re[i], in_im[i]);
  d->decimate(in, out);
  for (int i = 0; i < n / 2; i++) {
    out_re[i] = out[i].real();
    out_im[i] = out[i].imag();
  }
}
void ref_hbd_free(void* h) { delete static_cast<HalfBandDecimator*>(h); }

// ---- one-channel receiver chain, composed per vfo.cpp ---------------------
// main VFO (mix + half-band cascade, vfo.cpp:235-251) -> sub VFO (mix +
// cascade + optional late /5//6 + USB demod + optional audio LPF + short
// cast, vfo.cpp:253-387), with the sdrj DC EMA in front
// (sdrj.cpp:277-283).  Uses ONLY reference objects for the DSP.
struct RefChain {
  double fs;
  int main_stages, sub_stages, late, discard;
  float gain;
  bool dc_correct;
  cpx_typef avept;  // sdrj.cpp:280 static
  Oscillator* osc_main;
  Oscillator* osc_sub;
  std::vector<HalfBandDecimator*> hdec_main, hdec_sub;
  FIR *fir_decI, *fir_decQ, *fir_usb;
  FIRHilbert* philbert;
  DelayThing<float> delayT;
  std::vector<std::vector<cpx_typef>> dec_main, dec_sub;
};

void* ref_chain_new(double fs, double main_mixer_freq, int main_stages,
                    double sub_mixer_freq, int sub_stages, int late_factor,
                    double filterbw, double gain, int dc_correct,
                    int samples_per_buffer) {
  RefChain* c = new RefChain();
  c->fs = fs;
  c->main_stages = main_stages;
  c->sub_stages = sub_stages;
  c->late = late_factor;
  c->discard = late_factor - 1;  // vfo.cpp:73
  c->gain = static_cast<float>(gain);
  c->dc_correct = dc_correct != 0;
  c->avept = 0;
  c->osc_main = new Oscillator(fs, main_mixer_freq);  // vfo.cpp:64
  double main_rate = fs / std::pow(2.0, main_stages);
  c->osc_sub = new Oscillator(main_rate, sub_mixer_freq);
  // hdecimator[a] = HalfBandDecimator(11, Fs/2^a), vfo.cpp:127-133.  inlen
  // only sizes the FIR queue; it must hold one block at that stage, so use
  // the actual per-stage block length (the reference's Fs/2^a assumes
  // spb <= Fs, which also holds here).
  int spb = samples_per_buffer;
  c->dec_main.resize(main_stages + 1);
  c->dec_main[0].resize(spb);
  for (int a = 0; a < main_stages; a++) {
    c->hdec_main.push_back(new HalfBandDecimator(11, spb >> a));
    c->dec_main[a + 1].resize(c->dec_main[a].size() / 2);
  }
  int sub_spb = spb >> main_stages;
  c->dec_sub.resize(sub_stages + 1);
  c->dec_sub[0].resize(sub_spb);
  for (int a = 0; a < sub_stages; a++) {
    c->hdec_sub.push_back(new HalfBandDecimator(11, sub_spb >> a));
    c->dec_sub[a + 1].resize(c->dec_sub[a].size() / 2);
  }
  int target_rate =
      static_cast<int>(main_rate / std::pow(2.0, sub_stages));
  c->fir_decI = c->fir_decQ = nullptr;
  if (late_factor > 1) {
    // vfo.cpp:70-101: targetRate there is already divided by lateDecimate
    target_rate /= late_factor;
    firfilter filt;
    QVector<float> coeff = filt.low_pass(
        2, target_rate * late_factor, target_rate / 2.0,
        static_cast<double>(target_rate) / (late_factor - 1),
        firfilter::win_type::WIN_HAMMING, 0);
    c->fir_decI = new FIR(coeff.length(), 0);
    c->fir_decQ = new FIR(coeff.length(), 0);
    for (int i = 0; i < coeff.length(); i++) {
      c->fir_decI->FIRSetPoint(i, coeff[i]);
      c->fir_decQ->FIRSetPoint(i, coeff[i]);
    }
  }
  c->fir_usb = nullptr;
  if (filterbw > 0) {
    // vfo.cpp:106-124
    firfilter filt;
    QVector<float> coeff =
        filt.low_pass(2, target_rate, filterbw, filterbw / 4.0,
                      firfilter::win_type::WIN_HAMMING, 0);
    c->fir_usb = new FIR(coeff.length(), 0);
    for (int i = 0; i < coeff.length(); i++)
      c->fir_usb->FIRSetPoint(i, coeff[i]);
  }
  c->delayT.setLength((125 - 1) / 2);       // vfo.cpp:136
  c->philbert = new FIRHilbert(125, 48000);  // vfo.cpp:137 (Fs cancels)
  return c;
}

// Process one block of interleaved-complex input (planar arrays, n complex
// samples == samples_per_buffer).  Returns number of int16 audio samples.
int ref_chain_process(void* h, const float* re, const float* im, int n,
                      short* audio_out) {
  RefChain* c = static_cast<RefChain*>(h);
  // sdrj::demodData DC EMA (sdrj.cpp:277-283)
  for (int i = 0; i < n; i++) {
    cpx_typef curr(re[i], im[i]);
    if (c->dc_correct) {
      c->avept = c->avept * (1.0f - 0.000001f) + 0.000001f * curr;
      curr -= c->avept;
    }
    // main vfo mix (vfo.cpp:237-245)
    c->dec_main[0][i] = c->osc_main->_vector * curr;
    c->osc_main->tick();
  }
  for (int a = 0; a < c->main_stages; a++)  // vfo.cpp:247-251
    c->hdec_main[a]->decimate(c->dec_main[a], c->dec_main[a + 1]);
  // sub vfo mix + cascade (vfo.cpp:253-266 recursion into process)
  std::vector<cpx_typef>& mo = c->dec_main[c->main_stages];
  for (size_t i = 0; i < mo.size(); i++) {
    c->dec_sub[0][i] = c->osc_sub->_vector * mo[i];
    c->osc_sub->tick();
  }
  for (int a = 0; a < c->sub_stages; a++)
    c->hdec_sub[a]->decimate(c->dec_sub[a], c->dec_sub[a + 1]);
  std::vector<cpx_typef>& so = c->dec_sub[c->sub_stages];
  int mark = 0;
  if (c->late <= 1) {
    // usb_demod (vfo.cpp:300-332); offsetbw path never fires (always 0)
    for (size_t i = 0; i < so.size(); i++) {
      cpx_typef curr = so[i];
      float usb;
      if (c->fir_usb) {
        usb = c->fir_usb->FIRUpdateAndProcess(
            c->delayT.update_dont_touch(curr.real()) -
            c->philbert->FIRUpdateAndProcess(curr.imag()));
      } else {
        usb = c->delayT.update_dont_touch(curr.real()) -
              c->philbert->FIRUpdateAndProcess(curr.imag());
      }
      audio_out[mark++] = usb * c->gain * 32768.0;  // vfo.cpp:328 short cast
    }
  } else {
    // usb_decimdemod (vfo.cpp:334-387); NOTE the reference resets the
    // polyphase `check` phase at every buffer (local variable), which is a
    // latent discontinuity its own configs avoid by using buffer lengths
    // divisible by the factor — reproduced faithfully here.
    int check = 0;
    for (size_t i = 0; i < so.size(); i++) {
      cpx_typef curr = so[i];
      if (check == 0) {
        curr = cpx_typef(c->fir_decI->FIRUpdateAndProcess(curr.real()),
                         c->fir_decQ->FIRUpdateAndProcess(curr.imag()));
        float usb = c->delayT.update_dont_touch(curr.real()) -
                    c->philbert->FIRUpdateAndProcess(curr.imag());
        if (c->fir_usb) usb = c->fir_usb->FIRUpdateAndProcess(usb);
        audio_out[mark++] = usb * c->gain * 32768.0;
        check++;
      } else if (check == c->discard) {
        c->fir_decI->FIRUpdate(curr.real());
        c->fir_decQ->FIRUpdate(curr.imag());
        check = 0;
      } else {
        c->fir_decI->FIRUpdate(curr.real());
        c->fir_decQ->FIRUpdate(curr.imag());
        check++;
      }
    }
  }
  return mark;
}

void ref_chain_free(void* h) {
  RefChain* c = static_cast<RefChain*>(h);
  delete c->osc_main;
  delete c->osc_sub;
  for (auto* d : c->hdec_main) delete d;
  for (auto* d : c->hdec_sub) delete d;
  delete c->fir_decI;
  delete c->fir_decQ;
  delete c->fir_usb;
  delete c->philbert;
  delete c;
}

}  // extern "C"
