// Minimal glog API shim so the reference pbrt tree compiles without the
// (empty) glog submodule.  Implements only the surface the reference uses:
// LOG(severity), VLOG(n), CHECK / CHECK_{EQ,NE,LT,LE,GT,GE,NEAR,NOTNULL},
// DCHECK variants, FLAGS_{v,minloglevel,stderrthreshold,log_dir,logtostderr},
// google::InitGoogleLogging.  Messages go to stderr; FATAL aborts.
//
// This is a from-scratch shim written for the out-of-tree reference build
// (see refbuild/build.sh); it shares no code with glog.
#ifndef GLOG_SHIM_LOGGING_H
#define GLOG_SHIM_LOGGING_H

#include <cstdlib>
#include <cmath>
#include <iostream>
#include <sstream>
#include <string>

// glog-compatible flag globals (defined in refbuild/shim/glog_shim.cpp).
extern int FLAGS_v;
extern int FLAGS_minloglevel;
extern int FLAGS_stderrthreshold;
extern bool FLAGS_logtostderr;
extern std::string FLAGS_log_dir;

namespace google {
inline void InitGoogleLogging(const char *) {}
inline void ShutdownGoogleLogging() {}
}  // namespace google

namespace glog_shim {

enum Severity { SEV_INFO = 0, SEV_WARNING = 1, SEV_ERROR = 2, SEV_FATAL = 3 };

class LogMessage {
  public:
    LogMessage(Severity sev, const char *file, int line) : sev_(sev) {
        stream_ << "[" << "IWEF"[sev] << " " << file << ":" << line << "] ";
    }
    ~LogMessage() {
        if (sev_ >= FLAGS_minloglevel && sev_ >= FLAGS_stderrthreshold)
            std::cerr << stream_.str() << std::endl;
        else if (sev_ == SEV_FATAL)
            std::cerr << stream_.str() << std::endl;
        if (sev_ == SEV_FATAL) std::abort();
    }
    std::ostream &stream() { return stream_; }

  private:
    Severity sev_;
    std::ostringstream stream_;
};

// Swallows the ostream produced by a conditional log so the ternary in
// VLOG/DCHECK type-checks (mirrors glog's LogMessageVoidify trick).
struct Voidify {
    void operator&(std::ostream &) {}
};

template <typename T>
T CheckNotNull(const char *file, int line, const char *msg, T t) {
    if (t == nullptr)
        LogMessage(SEV_FATAL, file, line).stream() << "Check failed: " << msg;
    return t;
}

}  // namespace glog_shim

#define GLOG_SHIM_INFO ::glog_shim::SEV_INFO
#define GLOG_SHIM_WARNING ::glog_shim::SEV_WARNING
#define GLOG_SHIM_ERROR ::glog_shim::SEV_ERROR
#define GLOG_SHIM_FATAL ::glog_shim::SEV_FATAL

#define LOG(severity) \
    ::glog_shim::LogMessage(GLOG_SHIM_##severity, __FILE__, __LINE__).stream()

#define VLOG(n)                  \
    !((n) <= FLAGS_v) ? (void)0 \
                      : ::glog_shim::Voidify() & LOG(INFO)

#define CHECK(cond)        \
    (cond) ? (void)0       \
           : ::glog_shim::Voidify() & LOG(FATAL) << "Check failed: " #cond " "

#define GLOG_SHIM_CHECK_OP(name, op, a, b)                                  \
    ((a)op(b)) ? (void)0                                                    \
               : ::glog_shim::Voidify() & LOG(FATAL) << "Check failed: "    \
                                                     << #a " " #op " " #b   \
                                                     << " (" << (a) << " vs " \
                                                     << (b) << ") "

#define CHECK_EQ(a, b) GLOG_SHIM_CHECK_OP(EQ, ==, a, b)
#define CHECK_NE(a, b) GLOG_SHIM_CHECK_OP(NE, !=, a, b)
#define CHECK_LT(a, b) GLOG_SHIM_CHECK_OP(LT, <, a, b)
#define CHECK_LE(a, b) GLOG_SHIM_CHECK_OP(LE, <=, a, b)
#define CHECK_GT(a, b) GLOG_SHIM_CHECK_OP(GT, >, a, b)
#define CHECK_GE(a, b) GLOG_SHIM_CHECK_OP(GE, >=, a, b)
#define CHECK_NEAR(a, b, eps) CHECK(std::abs((a) - (b)) <= (eps))
#define CHECK_NOTNULL(p) \
    ::glog_shim::CheckNotNull(__FILE__, __LINE__, "'" #p "' must not be NULL", (p))

// glog disables DCHECKs in NDEBUG builds; mirror that.
#ifdef NDEBUG
#define GLOG_SHIM_DCHECK_ACTIVE false
#else
#define GLOG_SHIM_DCHECK_ACTIVE true
#endif

#define DCHECK(cond) \
    (!GLOG_SHIM_DCHECK_ACTIVE || (cond)) ? (void)0 : ::glog_shim::Voidify() & LOG(FATAL) << "DCheck failed: " #cond " "
#define DCHECK_EQ(a, b) DCHECK((a) == (b))
#define DCHECK_NE(a, b) DCHECK((a) != (b))
#define DCHECK_LT(a, b) DCHECK((a) < (b))
#define DCHECK_LE(a, b) DCHECK((a) <= (b))
#define DCHECK_GT(a, b) DCHECK((a) > (b))
#define DCHECK_GE(a, b) DCHECK((a) >= (b))

#endif  // GLOG_SHIM_LOGGING_H
