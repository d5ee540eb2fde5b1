// Test-only shim so the reference's non-Qt DSP sources compile standalone
// as the golden oracle (VERDICT r1 item 3).  Minimal QVector facade over
// std::vector covering exactly the methods used by /root/reference/
// jonti/dsp.{h,cpp}, gnuradio/firfilter.{h,cpp} and halfbanddecimator.h.
#ifndef ORACLE_QVECTOR_SHIM_H
#define ORACLE_QVECTOR_SHIM_H

#include <cassert>
#include <cstddef>
#include <vector>
using std::size_t;

template <typename T>
class QVector {
 public:
  QVector() {}
  explicit QVector(int n) : v_(static_cast<size_t>(n)) {}
  void resize(int n) { v_.resize(static_cast<size_t>(n)); }
  int size() const { return static_cast<int>(v_.size()); }
  int length() const { return size(); }
  T& operator[](int i) { return v_[static_cast<size_t>(i)]; }
  const T& operator[](int i) const { return v_[static_cast<size_t>(i)]; }
  const T& at(int i) const { return v_[static_cast<size_t>(i)]; }
  T* data() { return v_.data(); }
  const T* data() const { return v_.data(); }
  static QVector<T> fromStdVector(const std::vector<T>& s) {
    QVector<T> out(static_cast<int>(s.size()));
    out.v_.assign(s.begin(), s.end());
    return out;
  }
  std::vector<T> toStdVector() const { return v_; }

 private:
  std::vector<T> v_;
};

#endif  // ORACLE_QVECTOR_SHIM_H
