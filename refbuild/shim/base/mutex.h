// Shim for glog's internal base/mutex.h, which the fork's photon integrators
// include directly.  Only `Mutex` and scoped `MutexLock` are used
// (photonmap.cpp:627,656,813); back them with std::mutex.
#ifndef SHIM_BASE_MUTEX_H
#define SHIM_BASE_MUTEX_H

#include <mutex>

class Mutex {
  public:
    void Lock() { m_.lock(); }
    void Unlock() { m_.unlock(); }

  private:
    std::mutex m_;
};

class MutexLock {
  public:
    explicit MutexLock(Mutex *m) : m_(m) { m_->Lock(); }
    ~MutexLock() { m_->Unlock(); }

  private:
    Mutex *m_;
};

#endif  // SHIM_BASE_MUTEX_H
