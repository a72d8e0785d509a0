// Standalone C++ test driver for the native host front-end — no Python.
// Exercises the same behaviors the reference plugin exhibits per tick
// (src/NeoMpcPlanner.cpp:202-254): plan pruning, carrot selection, hysteresis,
// the lethal gate, and request marshalling. Build+run via
// scripts/build_native.sh test target or scripts/check_native.sh.

#include "neo_mpc_host.h"

#include <atomic>
#include <cassert>
#include <cmath>
#include <cstdio>
#include <thread>
#include <vector>

static int checks = 0;
#define CHECK(cond)                                                   \
  do {                                                                \
    if (!(cond)) {                                                    \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      return 1;                                                       \
    }                                                                 \
    ++checks;                                                         \
  } while (0)

int main() {
  nmp_params p{0.4, 0.4, 0.4, 30.0};
  void* h = nmp_host_create(&p);

  // Straight 2 m plan, 50 poses.
  std::vector<nmp_pose> plan;
  for (int i = 0; i < 50; ++i) plan.push_back({2.0 * i / 49.0, 0.0, 0.0});
  CHECK(nmp_host_set_plan(h, plan.data(), 50) == 0);

  // 80x80 @ 0.05 m covers [-1, 3): the whole plan plus footprint margin.
  std::vector<float> clear(80 * 80, 0.0f);
  nmp_costmap cm{clear.data(), 80, 80, -1.0, -1.0, 0.05};
  const double fp[8] = {0.3, 0.2, -0.3, 0.2, -0.3, -0.2, 0.3, -0.2};
  const double vel[3] = {0.3, 0.0, 0.0};

  // Tick from the origin: carrot at the 0.4 m lookahead, request marshalled.
  nmp_pose pose{0, 0, 0};
  nmp_request req{};
  CHECK(nmp_host_tick(h, &pose, vel, &cm, fp, 4, &req) == 0);
  const double d = std::hypot(req.carrot_pose.x, req.carrot_pose.y);
  CHECK(d >= 0.4 && d < 0.46);
  CHECK(req.switch_opt == 0);
  CHECK(std::fabs(req.control_interval - 1.0 / 30.0) < 1e-12);
  CHECK(req.vel[0] == 0.3);
  CHECK(req.goal_pose.x == 2.0);
  // Transformed-plan window (received_global_plan, cpp:102-128): starts at
  // the closest pose (index 0 here) and ends at the first pose beyond half
  // the 4 m costmap extent (2 m) — the whole 2 m plan fits.
  CHECK(req.window_begin == 0);
  CHECK(req.window_end == 50);

  // Near the goal: closer_to_goal flips.
  pose = {1.9, 0.0, 0.0};
  CHECK(nmp_host_tick(h, &pose, vel, &cm, fp, 4, &req) == 0);
  CHECK(req.switch_opt == 1);

  // Consumed prefix: moving backwards does not re-select early poses.
  pose = {0.2, 0.0, 0.0};
  CHECK(nmp_host_tick(h, &pose, vel, &cm, fp, 4, &req) == 0);
  CHECK(req.carrot_pose.x + 0.2 > 0.9);

  // Lethal map: the collision gate fires (cpp:234-236).
  std::vector<float> lethal(80 * 80, 1.0f);
  nmp_costmap cml{lethal.data(), 80, 80, -1.0, -1.0, 0.05};
  pose = {0.5, 0.0, 0.0};
  CHECK(nmp_host_tick(h, &pose, vel, &cml, fp, 4, &req) == 3);
  CHECK(req.footprint_cost == 1.0);

  // Hysteresis: big carrot yaw + high cost -> slow_down; lookahead shrinks.
  nmp_params p2{0.2, 0.4, 0.4, 30.0};
  void* h2 = nmp_host_create(&p2);
  std::vector<nmp_pose> turny;
  for (int i = 0; i < 50; ++i) turny.push_back({2.0 * i / 49.0, 0.0, 1.5});
  nmp_host_set_plan(h2, turny.data(), 50);
  std::vector<float> high(80 * 80, 0.9f);
  nmp_costmap cmh{high.data(), 80, 80, -1.0, -1.0, 0.05};
  pose = {0, 0, 0};
  CHECK(nmp_host_tick(h2, &pose, vel, &cmh, fp, 4, &req) == 0);
  CHECK(req.slow_down == 1);
  CHECK(nmp_host_tick(h2, &pose, vel, &cmh, fp, 4, &req) == 0);
  CHECK(req.lookahead_dist == 0.2);  // min distance while slowed

  // Line cost: a single lethal cell on an edge is found by the grid walk.
  std::vector<float> onecell(40 * 40, 0.0f);
  onecell[20 * 40 + 26] = 1.0f;  // world x in [0.30, 0.35), y in [0, 0.05)
  nmp_costmap cm1{onecell.data(), 40, 40, -1.0, -1.0, 0.05};
  nmp_pose at{0.01, 0.0, 0.0};
  CHECK(nmp_footprint_cost(&cm1, fp, 4, &at) == 1.0);

  nmp_host_destroy(h);
  nmp_host_destroy(h2);

  // Concurrency: a reconfigure/setPlan thread racing the tick thread on ONE
  // host — the reference's dynamic-parameter callback runs concurrently with
  // computeVelocityCommands and self-deadlocks on its own mutex
  // (NeoMpcPlanner.cpp:339 + :352, SURVEY §2.3.4); here every entry point
  // takes the host mutex. Run under BUILD_FLAVOR=tsan (check_native.sh) to
  // prove the locking discipline, and under the default build as a smoke.
  {
    void* hc = nmp_host_create(&p);
    nmp_host_set_plan(hc, plan.data(), 50);
    std::atomic<bool> stop{false};
    std::thread reconf([&] {
      nmp_params q{0.3, 0.5, 0.4, 30.0};
      while (!stop.load(std::memory_order_relaxed)) {
        nmp_host_set_params(hc, &q);
        nmp_host_set_plan(hc, plan.data(), 50);
      }
    });
    nmp_request r{};
    bool tick_ok = true;
    for (int i = 0; i < 2000 && tick_ok; ++i) {
      double x = 0.003 * i;
      nmp_pose pc{x > 1.8 ? 1.8 : x, 0.0, 0.0};
      const int st = nmp_host_tick(hc, &pc, vel, &cm, fp, 4, &r);
      tick_ok = (st == 0 || st == 2);
    }
    stop.store(true);
    reconf.join();
    nmp_host_destroy(hc);
    CHECK(tick_ok);
  }

  std::printf("native host test OK (%d checks)\n", checks);
  return 0;
}
