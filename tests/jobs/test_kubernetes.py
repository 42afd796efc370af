"""Kubernetes backend tests: manifest construction, TPU placement, label
hygiene, and the submit/describe lifecycle — all against a fake kubectl
runner (reference analog: tests/sagemaker_launcher/ builds request dicts
with no AWS calls)."""

import json
import unittest

from mermaid_classifier_tpu.jobs.backend import JobRequest, JobStatus
from mermaid_classifier_tpu.jobs.kubernetes import (
    ClusterSpec,
    KubernetesJobBackend,
    build_job_manifest,
)

TPU_CLUSTER = ClusterSpec(
    image="gcr.io/reef/mermaid-tpu:abc123",
    namespace="extraction",
    accelerator="tpu-v5-lite-podslice",
    topology="1x1",
    chips=1,
    cpu="8",
    memory="32Gi",
    spot=True,
    service_account="mermaid-jobs",
)


def request(name="run1-w0"):
    return JobRequest(
        name=name,
        command=["python", "scripts/build_feature_bucket.py", "--source-ids", "1,3"],
        env={"OBJECT_STORE_ROOT": "s3://", "AWS_REGION": "us-east-1"},
        tags={"run_id": "run1", "worker": "0"},
    )


class FakeKubectl:
    """Records invocations; scripted `get job` responses."""

    def __init__(self):
        self.calls = []
        self.job_status: dict = {}

    def __call__(self, args, stdin=None):
        self.calls.append((list(args), stdin))
        if args[0] == "get":
            return json.dumps({"status": self.job_status})
        return ""


class TestManifest(unittest.TestCase):
    def test_long_names_stay_unique_after_truncation(self):
        """DNS-1123 truncation to 63 chars must not collapse distinct
        workers onto one Job name (a long run_id would otherwise cut the
        -wN suffix off): over-limit names carry a hash of the full value."""
        from mermaid_classifier_tpu.jobs.kubernetes import _name_safe

        run_id = "nightly-extraction-" + "x" * 50
        names = {_name_safe(f"{run_id}-w{i}") for i in range(20)}
        self.assertEqual(len(names), 20)
        for name in names:
            self.assertLessEqual(len(name), 63)
            self.assertRegex(name, r"^[a-z0-9][a-z0-9-]*[a-z0-9]$")
        # Short names are untouched.
        self.assertEqual(_name_safe("run1-w0"), "run1-w0")

    def test_tpu_job_manifest(self):
        m = build_job_manifest(request(), TPU_CLUSTER)
        self.assertEqual(m["apiVersion"], "batch/v1")
        self.assertEqual(m["kind"], "Job")
        self.assertEqual(m["metadata"]["name"], "run1-w0")
        self.assertEqual(m["metadata"]["namespace"], "extraction")
        self.assertEqual(m["metadata"]["labels"]["run_id"], "run1")

        spec = m["spec"]
        self.assertEqual(spec["backoffLimit"], 0)
        pod = spec["template"]["spec"]
        self.assertEqual(pod["restartPolicy"], "Never")
        self.assertEqual(pod["serviceAccountName"], "mermaid-jobs")
        self.assertEqual(
            pod["nodeSelector"]["cloud.google.com/gke-tpu-accelerator"],
            "tpu-v5-lite-podslice",
        )
        self.assertEqual(
            pod["nodeSelector"]["cloud.google.com/gke-tpu-topology"], "1x1"
        )
        self.assertEqual(pod["nodeSelector"]["cloud.google.com/gke-spot"], "true")
        self.assertEqual(pod["tolerations"][0]["key"], "cloud.google.com/gke-spot")

        (container,) = pod["containers"]
        self.assertEqual(container["image"], "gcr.io/reef/mermaid-tpu:abc123")
        self.assertEqual(container["command"][1], "scripts/build_feature_bucket.py")
        self.assertEqual(container["resources"]["limits"]["google.com/tpu"], 1)
        self.assertEqual(container["resources"]["requests"]["cpu"], "8")
        env = {e["name"]: e["value"] for e in container["env"]}
        self.assertEqual(env["OBJECT_STORE_ROOT"], "s3://")

    def test_cpu_job_has_no_tpu_placement(self):
        cpu_cluster = ClusterSpec(image="img", namespace="train")
        m = build_job_manifest(request("run1-train"), cpu_cluster)
        pod = m["spec"]["template"]["spec"]
        self.assertNotIn("nodeSelector", pod)
        self.assertNotIn("tolerations", pod)
        self.assertNotIn(
            "google.com/tpu", m["spec"]["template"]["spec"]["containers"][0][
                "resources"]["limits"],
        )

    def test_label_and_name_sanitization(self):
        req = request(name="Run_1 w/0!")
        req.tags["team"] = "reef team #7"
        m = build_job_manifest(req, TPU_CLUSTER)
        # DNS-1123: lowercase alnum + '-', no '_'/'.', no edge dashes.
        self.assertEqual(m["metadata"]["name"], "run-1-w-0")
        self.assertEqual(m["metadata"]["labels"]["team"], "reef-team-7")

    def test_container_runs_image_python_not_host_interpreter(self):
        """python_command() embeds the LAUNCHER's sys.executable; the pod
        must run the image's python, not a host path that doesn't exist."""
        req = JobRequest(
            name="run1-w0",
            command=["/opt/venv/bin/python3.12", "scripts/x.py", "--flag"],
            env={}, tags={},
        )
        m = build_job_manifest(req, TPU_CLUSTER)
        self.assertEqual(
            m["spec"]["template"]["spec"]["containers"][0]["command"],
            ["python", "scripts/x.py", "--flag"],
        )

    def test_active_deadline(self):
        cluster = ClusterSpec(image="img", active_deadline_seconds=7200)
        m = build_job_manifest(request(), cluster)
        self.assertEqual(m["spec"]["activeDeadlineSeconds"], 7200)


class TestLifecycle(unittest.TestCase):
    def test_submit_applies_manifest(self):
        kubectl = FakeKubectl()
        backend = KubernetesJobBackend(TPU_CLUSTER, kubectl_runner=kubectl)
        job_id = backend.submit(request())
        self.assertEqual(job_id, "run1-w0")
        args, stdin = kubectl.calls[0]
        self.assertEqual(args[:3], ["apply", "-f", "-"])
        manifest = json.loads(stdin)
        self.assertEqual(manifest["metadata"]["name"], "run1-w0")

    def test_describe_status_mapping(self):
        kubectl = FakeKubectl()
        backend = KubernetesJobBackend(TPU_CLUSTER, kubectl_runner=kubectl)
        job_id = backend.submit(request())

        kubectl.job_status = {"active": 1}
        self.assertEqual(backend.describe(job_id), JobStatus.IN_PROGRESS)

        kubectl.job_status = {"succeeded": 1}
        self.assertEqual(backend.describe(job_id), JobStatus.COMPLETED)

        kubectl.job_status = {
            "failed": 1,
            "conditions": [{"type": "Failed", "status": "True"}],
        }
        self.assertEqual(backend.describe(job_id), JobStatus.FAILED)

    def test_terminate_all_deletes_submitted(self):
        kubectl = FakeKubectl()
        backend = KubernetesJobBackend(TPU_CLUSTER, kubectl_runner=kubectl)
        backend.submit(request("run1-w0"))
        backend.submit(request("run1-w1"))
        backend.terminate_all()
        deletes = [a for a, _ in kubectl.calls if a[0] == "delete"]
        self.assertEqual(len(deletes), 2)


class TestFanOutThroughK8s(unittest.TestCase):
    def test_launch_processing_builds_one_job_per_worker(self):
        """The full launcher flow over the k8s backend with a fake kubectl:
        run YAML -> shard requests -> one batch/v1 Job per worker."""
        import tempfile
        import textwrap
        from pathlib import Path

        from mermaid_classifier_tpu.jobs import launch_processing, parse_run_config

        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td)
            (tmp / "sources.csv").write_text("source_id\n1\n2\n3\n")
            run_yaml = tmp / "run.yaml"
            run_yaml.write_text(textwrap.dedent("""\
                job:
                  entrypoint: scripts/build_feature_bucket.py
                  cluster:
                    image: gcr.io/reef/mermaid-tpu:abc123
                    namespace: extraction
                    accelerator: tpu-v5-lite-podslice
                    topology: 1x1
                    chips: 1
                processing:
                  container_args: [--source-bucket, img, --target-bucket, feat]
                  shard:
                    items_csv: sources.csv
                    workers: 2
                    per_worker_arg: --source-ids
                """))
            config = parse_run_config(run_yaml)
            kubectl = FakeKubectl()
            backend = KubernetesJobBackend(
                ClusterSpec(**config.job.cluster.model_dump()),
                kubectl_runner=kubectl,
            )
            job_ids = launch_processing(config, backend, "run9")
            self.assertEqual(job_ids, ["run9-w0", "run9-w1"])
            manifests = [json.loads(stdin) for args, stdin in kubectl.calls
                         if args[0] == "apply"]
            self.assertEqual(len(manifests), 2)
            cmd0 = manifests[0]["spec"]["template"]["spec"]["containers"][0][
                "command"]
            self.assertEqual(cmd0[-2:], ["--source-ids", "1,3"])
            cmd1 = manifests[1]["spec"]["template"]["spec"]["containers"][0][
                "command"]
            self.assertEqual(cmd1[-1], "2")


if __name__ == "__main__":
    unittest.main()
