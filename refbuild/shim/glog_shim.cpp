// Flag globals for the glog shim (see glog/logging.h in this directory).
#include <string>
int FLAGS_v = 0;
int FLAGS_minloglevel = 0;
int FLAGS_stderrthreshold = 2;  // errors and above by default
bool FLAGS_logtostderr = false;
std::string FLAGS_log_dir;
