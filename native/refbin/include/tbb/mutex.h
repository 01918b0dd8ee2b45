#pragma once
namespace tbb {
class mutex {
  public:
    void lock() {}
    void unlock() {}
    class scoped_lock {
      public:
        scoped_lock() {}
        explicit scoped_lock(mutex&) {}
    };
};
}
