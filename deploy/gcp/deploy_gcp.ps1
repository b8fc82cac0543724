# GCP estate deployment from Windows — PowerShell counterpart of
# scripts/setup_gke.sh and mlops/workspace.py, the TPU-native analog of the
# reference's mlops/azure/deploy_azure.ps1 (login check, subscription/project
# selection, resource creation, template deploy, kubeconfig wiring).
#
# Creates the GKE cluster + TPU node pools + storage buckets + artifact
# registry described by deploy/gcp/infrastructure.yaml, builds and pushes the
# production image, and applies the Kubernetes stack.
#
# Usage: .\deploy_gcp.ps1 -Environment dev -Project my-proj [-Region us-central1] [-ServingMaxNodes 8] [-DryRun]
param(
    [Parameter(Mandatory = $true)]
    [ValidateSet("dev", "staging", "prod")]
    [string]$Environment,

    [Parameter(Mandatory = $true)]
    [string]$Project,

    [Parameter(Mandatory = $false)]
    [string]$Region = "us-central1",

    [Parameter(Mandatory = $false)]
    [string]$Cluster = "ldm3d-cluster",

    [Parameter(Mandatory = $false)]
    [int]$ServingMaxNodes = 8,

    [Parameter(Mandatory = $false)]
    [int]$TrainMaxNodes = 2,

    [Parameter(Mandatory = $false)]
    [switch]$DryRun
)

$ErrorActionPreference = "Stop"

function Invoke-Step {
    param([string]$What, [string[]]$Command, [switch]$AllowFailure)
    Write-Host "== $What ==" -ForegroundColor Cyan
    if ($DryRun) {
        Write-Host "  (dry-run) $($Command -join ' ')" -ForegroundColor Yellow
        return
    }
    & $Command[0] @($Command[1..($Command.Length - 1)])
    if ($LASTEXITCODE -ne 0 -and -not $AllowFailure) {
        Write-Error "step failed: $What"
        exit 1
    }
}

try { gcloud --version | Out-Null } catch {
    Write-Error "gcloud CLI is not installed. Install the Google Cloud SDK first."
    exit 1
}

$Account = gcloud config get-value account 2>$null
if (-not $Account -and -not $DryRun) {
    Write-Host "logging in to Google Cloud ..." -ForegroundColor Yellow
    gcloud auth login
}
Write-Host "using project: $Project ($Environment)" -ForegroundColor Green

# cluster suffixed per environment so dev/staging/prod estates coexist,
# matching the reference's per-environment resource naming
if ($Environment -ne "prod") { $Cluster = "$Cluster-$Environment" }

Invoke-Step "GKE cluster $Cluster in $Project/$Region" @(
    "gcloud", "container", "clusters", "create", $Cluster,
    "--project", $Project, "--region", $Region,
    "--release-channel", "regular", "--num-nodes", "1",
    "--machine-type", "n2-standard-8") -AllowFailure

Invoke-Step "TPU serving pool (1-chip v5e)" @(
    "gcloud", "container", "node-pools", "create", "tpu-serving-pool",
    "--project", $Project, "--region", $Region, "--cluster", $Cluster,
    "--machine-type", "ct5lp-hightpu-1t", "--num-nodes", "0",
    "--enable-autoscaling", "--min-nodes", "0", "--max-nodes", "$ServingMaxNodes") -AllowFailure

Invoke-Step "TPU training pool (v5e-8 slices, spot)" @(
    "gcloud", "container", "node-pools", "create", "tpu-train-pool",
    "--project", $Project, "--region", $Region, "--cluster", $Cluster,
    "--machine-type", "ct5lp-hightpu-8t", "--tpu-topology", "2x4",
    "--num-nodes", "0", "--enable-autoscaling", "--min-nodes", "0",
    "--max-nodes", "$TrainMaxNodes", "--spot") -AllowFailure

foreach ($b in @("ldm3d-datasets", "ldm3d-checkpoints", "ldm3d-outputs")) {
    Invoke-Step "bucket gs://$b" @(
        "gsutil", "mb", "-p", $Project, "-l", $Region, "gs://$b") -AllowFailure
}

Invoke-Step "artifact registry" @(
    "gcloud", "artifacts", "repositories", "create", "ldm3d",
    "--repository-format=docker", "--project", $Project,
    "--location", $Region) -AllowFailure

# the manifests reference the bare image name; nodes can only pull it from
# the registry created above, so build+push and rewrite the image ref —
# without this every pod sits in ImagePullBackOff
$Image = "$Region-docker.pkg.dev/$Project/ldm3d/ldm3d-tpu:latest"
$RepoRoot = (Resolve-Path (Join-Path $PSScriptRoot "..\..")).Path
$HaveDocker = $false
try { docker info 2>$null | Out-Null; $HaveDocker = ($LASTEXITCODE -eq 0) } catch {}
if ($HaveDocker) {
    Invoke-Step "configure docker for $Region-docker.pkg.dev" @(
        "gcloud", "auth", "configure-docker", "$Region-docker.pkg.dev", "--quiet")
    Invoke-Step "build and push $Image" @(
        "docker", "build", "--target", "production", "-t", $Image,
        "-f", (Join-Path $RepoRoot "deploy\docker\Dockerfile"), $RepoRoot)
    Invoke-Step "push image" @("docker", "push", $Image)
} else {
    Write-Warning "docker unavailable - push $Image yourself (e.g. gcloud builds submit --tag $Image $RepoRoot) before pods can start"
}

Invoke-Step "cluster credentials" @(
    "gcloud", "container", "clusters", "get-credentials", $Cluster,
    "--project", $Project, "--region", $Region)

Write-Host "== applying kubernetes stack (image -> $Image) ==" -ForegroundColor Cyan
foreach ($m in @("deployment", "jobs", "ingress")) {
    $Manifest = Join-Path $RepoRoot "deploy\kubernetes\$m.yaml"
    if ($DryRun) {
        Write-Host "  (dry-run) kubectl apply -f $Manifest" -ForegroundColor Yellow
        continue
    }
    (Get-Content $Manifest -Raw) -replace "image: ldm3d-tpu:latest", "image: $Image" |
        kubectl apply -f -
    if ($LASTEXITCODE -ne 0) { Write-Error "kubectl apply failed for $m"; exit 1 }
}

Write-Host "done." -ForegroundColor Green
